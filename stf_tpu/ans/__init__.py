"""Native rANS entropy coder, bound via ctypes.

Python surface mirrors the reference coder's API
(`compressai/cpp_exts/rans/rans_interface.cpp:352-372`):

    BufferedRansEncoder  .encode_with_indexes(...) [buffers] / .flush() -> bytes
    RansEncoder          .encode_with_indexes(...) -> bytes (one-shot)
    RansDecoder          .decode_with_indexes(...) -> np.ndarray[int32]
                         .set_stream(bytes) / .decode_stream(...) -> np.ndarray

plus ``pmf_to_quantized_cdf`` (the reference's `compressai._CXX` module,
`cpp_exts/ops/ops.cpp:83-90`).

Unlike the reference, all entry points accept NumPy arrays (or anything
array-like) and avoid Python list marshalling entirely.
"""

from ._binding import (
    BufferedRangeEncoder,
    BufferedRansEncoder,
    RangeDecoder,
    RangeEncoder,
    RansDecoder,
    RansEncoder,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_rows,
)

# host entropy backends by registry name (stf_tpu.set_entropy_coder):
# same symbol protocol, different bit layers — streams are NOT
# interoperable between backends (pick one per deployment, like the
# reference's `--entropy-coder` flag).
_HOST_CODERS = {
    "rans": (BufferedRansEncoder, RansEncoder, RansDecoder),
    "rangecoder": (BufferedRangeEncoder, RangeEncoder, RangeDecoder),
}


def resolve_host_backend(name=None) -> str:
    """Validated host-backend name; `None` resolves to the package-level
    selection (`stf_tpu.get_entropy_coder()`). Long-lived objects (the
    Codec, the entropy-model coders) snapshot this at construction so a
    later registry flip can't silently decode a stream with the wrong
    bit layer — the two backends' streams are NOT interoperable."""
    if name is None:
        import stf_tpu

        name = stf_tpu.get_entropy_coder()
    if name not in _HOST_CODERS:
        raise ValueError(
            f"unknown host entropy coder {name!r} "
            f"(available: {', '.join(_HOST_CODERS)})"
        )
    return name


def host_coder_classes(name=None):
    """(BufferedEncoder, Encoder, Decoder) classes for the named host
    entropy backend; with no name, follows the package-level selection
    (`stf_tpu.get_entropy_coder()`)."""
    return _HOST_CODERS[resolve_host_backend(name)]


__all__ = [
    "BufferedRansEncoder",
    "RansEncoder",
    "RansDecoder",
    "BufferedRangeEncoder",
    "RangeEncoder",
    "RangeDecoder",
    "host_coder_classes",
    "resolve_host_backend",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_rows",
]
