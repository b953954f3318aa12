"""Meta-training entry — reference train_dynavsr/meta-train script name
(SURVEY.md §2.5 [role H, name L]). Thin alias: cli/train.py dispatches on
opt['model']; meta configs set `model: video_meta`."""

from dynavsr_tpu.cli.train import main

if __name__ == "__main__":
    main()
