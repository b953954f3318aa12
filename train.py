#!/usr/bin/env python
"""Root-level trainer wrapper — reference invocation parity:
`python train.py -opt options/train/train_EDVR_M.yml` (SURVEY.md §2.5)."""

from dynavsr_tpu.cli.train import main

if __name__ == "__main__":
    main()
