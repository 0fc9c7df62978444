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
    BufferedRansEncoder,
    RansDecoder,
    RansEncoder,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_rows,
)

__all__ = [
    "BufferedRansEncoder",
    "RansEncoder",
    "RansDecoder",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_rows",
]
