#!/usr/bin/env python
"""Gate-decorator pruning training entry point (see
stf_tpu/training/train_gd.py)."""

import sys

from stf_tpu.training.train_gd import main

if __name__ == "__main__":
    main(sys.argv[1:])
