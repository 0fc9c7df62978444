#!/usr/bin/env python
"""RD training entry point (see stf_tpu/training/train.py)."""

import sys

from stf_tpu.training.train import main

if __name__ == "__main__":
    main(sys.argv[1:])
