#!/usr/bin/env python
"""Thin shim so reference users can keep typing `python exp_runner.py ...`.

The actual runner lives in rnb_tpu.cli / rnb_tpu.train.runner.
"""
from rnb_tpu.cli import main

if __name__ == "__main__":
    main()
