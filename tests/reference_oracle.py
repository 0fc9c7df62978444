"""Load the reference implementation (/root/reference) as a numerical test
oracle.

The reference's native extensions aren't built in this environment, so its
`compressai.ans` / `compressai._CXX` modules are stubbed with our own
API-compatible native coder, and `timm.models.layers` with minimal torch
equivalents. This runs the reference's *Python/torch* math unchanged,
letting parity tests compare our JAX models and checkpoint importer against
the genuine article. Tests must skip when /root/reference is absent — the
framework itself never depends on it.
"""

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "compressai"))


def load_reference():
    """Import and return the reference `compressai` package (or None)."""
    if not reference_available():
        return None
    if "compressai" in sys.modules:
        return sys.modules["compressai"]

    import numpy as np
    import torch
    import torch.nn as nn

    from stf_tpu import ans as my_ans

    # --- timm stub (only the three symbols the reference uses) -------------
    class DropPath(nn.Module):  # eval-only oracle: identity
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) else (v, v)
    timm_layers.trunc_normal_ = (
        lambda t, std=1.0, **kw: torch.nn.init.trunc_normal_(t, std=std)
    )
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    # --- native-extension stubs backed by our coder -------------------------
    cxx = types.ModuleType("compressai._CXX")
    cxx.pmf_to_quantized_cdf = lambda pmf, precision: [
        int(v)
        for v in my_ans.pmf_to_quantized_cdf(
            np.asarray(pmf, np.float32), precision
        )
    ]

    class _ListRansDecoder(my_ans.RansDecoder):
        def decode_with_indexes(self, *args, **kw):
            return super().decode_with_indexes(*args, **kw).tolist()

        def decode_stream(self, *args, **kw):
            return super().decode_stream(*args, **kw).tolist()

    ans_mod = types.ModuleType("compressai.ans")
    ans_mod.BufferedRansEncoder = my_ans.BufferedRansEncoder
    ans_mod.RansEncoder = my_ans.RansEncoder
    ans_mod.RansDecoder = _ListRansDecoder
    sys.modules["compressai._CXX"] = cxx
    sys.modules["compressai.ans"] = ans_mod

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import compressai

    return compressai


def to_nchw(x_nhwc):
    import numpy as np

    return np.ascontiguousarray(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def to_nhwc(x_nchw):
    import numpy as np

    return np.ascontiguousarray(np.asarray(x_nchw).transpose(0, 2, 3, 1))
