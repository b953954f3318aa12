#!/usr/bin/env python
"""Root-level eval wrapper — reference invocation parity:
`python test.py -opt options/test/test_EDVR_M.yml` (SURVEY.md §2.5)."""

from dynavsr_tpu.cli.test import main

if __name__ == "__main__":
    main()
