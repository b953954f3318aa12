#!/usr/bin/env python
"""Root-level DynaVSR adaptation-eval wrapper (SURVEY.md §2.5, §3.4)."""

from dynavsr_tpu.cli.test_dynavsr import main

if __name__ == "__main__":
    main()
