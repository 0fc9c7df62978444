#!/usr/bin/env python
"""FLOPs/params calculator entry point (see stf_tpu/utils/flops.py)."""

import sys

from stf_tpu.utils.flops import main

if __name__ == "__main__":
    main(sys.argv[1:])
