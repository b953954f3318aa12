"""MFDN/SFDN trainer entry — reference train_downscaler script name
(SURVEY.md §2.5, §3.5 [role H, name L]). Thin alias: cli/train.py
dispatches on opt['model']; downscaler configs set `model: downscaler`."""

from dynavsr_tpu.cli.train import main

if __name__ == "__main__":
    main()
