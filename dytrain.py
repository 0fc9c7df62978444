#!/usr/bin/env python
"""DYSTF distillation training entry point (see stf_tpu/training/dytrain.py)."""

import sys

from stf_tpu.training.dytrain import main

if __name__ == "__main__":
    main(sys.argv[1:])
