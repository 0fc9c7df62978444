"""stf_tpu — a TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the STF codebase
(CVPR 2022, "The Devil Is in the Details: Window-based Attention for Image
Compression", itself a stripped fork of CompressAI). The compute path is
functional JAX compiled with XLA for TPU; real bitstream production uses a
native C++ rANS coder driven from the host, pipelined against device compute.

Layout:
    stf_tpu.ops            differentiable ops (lower_bound, ste_round, ...)
    stf_tpu.ans            native C++ rANS entropy coder (ctypes bindings)
    stf_tpu.entropy        entropy models (EntropyBottleneck, GaussianConditional)
    stf_tpu.layers         NN building blocks (GDN, window attention, convs)
    stf_tpu.models         codec models (cnn/stf/tbc/cc/cc_gd/dystf)
    stf_tpu.zoo            model registry + PyTorch checkpoint import
    stf_tpu.datasets       image-folder data pipeline
    stf_tpu.parallel       mesh/sharding utilities for multi-chip training
    stf_tpu.training       RD training loops (train / dytrain / train_gd)
    stf_tpu.cli            evaluation CLI
"""

__version__ = "0.1.0"

_entropy_coder = "rans"
_available_entropy_coders = ["rans", "rangecoder"]


def available_entropy_coders():
    """List the names of the usable entropy coder backends.

    Mirrors the registry semantics of the reference
    (`compressai/__init__.py:22-62`): "rans" is the default 64-bit rANS
    backend; "rangecoder" is a native carry-propagating range coder with
    the same symbol protocol (the reference's optional `range_coder` pip
    backend, here built into the same C++ extension — no pip dependency).
    Streams are not interoperable between backends.
    """
    return list(_available_entropy_coders)


def set_entropy_coder(name: str) -> None:
    """Select the default entropy coder backend by name."""
    global _entropy_coder
    if name not in _available_entropy_coders:
        raise ValueError(
            f"Unknown entropy coder {name!r} "
            f"(available: {', '.join(_available_entropy_coders)})"
        )
    _entropy_coder = name


def get_entropy_coder() -> str:
    """Return the name of the default entropy coder backend."""
    return _entropy_coder
