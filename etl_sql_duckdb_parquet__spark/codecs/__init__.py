"""Lightweight columnar compression codecs (pure numpy kernels).

The reference repo's columnar encoding is delegated to Parquet/ZSTD
(reference ``src/etl/load.py:44-48``; the win is attributed to dictionary /
delta / bit-packing in ``docs/benchmark_results.md:72-77``).  Here the codec
family is implemented from scratch so the engine owns the encoding:

- ``core``     — integer codecs: PLAIN, FOR (frame-of-reference + bit-pack),
                 DELTA, RLE, DICT, with exact-size statistics-driven
                 auto-selection (``encode_int_best``).
- ``fsst``     — FSST symbol-table compression for byte strings (public
                 algorithm: Boncz, Neumann, Leis — "FSST: Fast Random Access
                 String Compression", VLDB 2020).
- ``strings``  — string-array container: dictionary / FSST / plain, selected
                 by cardinality and sampled compressibility.

All kernels are vectorized numpy over contiguous buffers — they are invoked
from Arrow-batched pandas UDFs, never per row.  Every blob is
self-describing: ``decode_int(encode_int(x)) == x`` bit-identical.
"""

from .core import (
    CODEC_NAMES,
    analyze_int,
    decode_int,
    encode_int,
    encode_int_best,
    select_int_codec,
)
from .strings import decode_strings, encode_strings

__all__ = [
    "CODEC_NAMES",
    "analyze_int",
    "decode_int",
    "encode_int",
    "encode_int_best",
    "select_int_codec",
    "decode_strings",
    "encode_strings",
]
