"""Integer codec kernels: PLAIN / FOR / DELTA / RLE / DICT + auto-selector.

Pure numpy, no Spark dependency — unit-testable standalone and invoked from
Arrow-batched UDFs in ``encode.encode_job``.

Blob layout (all little-endian)::

    [u8 codec_id][codec-specific header][payload]

    PLAIN : u64 n, u8 itemsize(4|8)      | n * int32 or int64
    FOR   : u64 n, i64 ref, u8 width     | bit-packed (v - ref), width bits each
    DELTA : u64 n, i64 first             | nested blob of diffs (n-1 values)
    RLE   : u64 n                        | nested(run values) + nested(run lengths)
    DICT  : u64 n, u32 card, u8 codewidth| nested(sorted unique) + bit-packed codes

"nested blob" = u64 byte-length prefix + a recursively encoded blob, so every
blob is self-describing and ``decode_int`` needs no side metadata.

All values flow as int64 internally (DELTA diffs of int32 inputs can exceed
the int32 range, e.g. INT32_MAX - INT32_MIN); the token layer casts back to
int32 at the boundary.  Bit-identity invariant:
``decode_int(encode_int_best(x)) == x`` elementwise for any int64 input whose
pairwise differences fit in int64 (always true for int32-range tokens).

Design notes for scale: kernels operate on one Spark-partition's worth of
concatenated token values at a time (tens of MB).  Bit-packing is chunked
(``_CHUNK`` values per step) to bound intermediate memory; the chunk size is
a multiple of 8 so per-chunk bit counts stay byte-aligned and chunks
concatenate exactly.

Capability parity: the reference attributes its compression win to
dictionary/delta/bit-packing inside Parquet (reference
``docs/benchmark_results.md:72-77``); these are those codecs, owned by us.
"""

from __future__ import annotations

import struct

import numpy as np

CODEC_PLAIN = 0
CODEC_FOR = 1
CODEC_DELTA = 2
CODEC_RLE = 3
CODEC_DICT = 4
# 5..8 are byte/string codecs — see fsst.py / strings.py.

CODEC_NAMES = {
    CODEC_PLAIN: "plain",
    CODEC_FOR: "for",
    CODEC_DELTA: "delta",
    CODEC_RLE: "rle",
    CODEC_DICT: "dict",
    5: "fsst",
    6: "strarr",
    7: "plainbytes",
    8: "strdict",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

# Values per bit-pack chunk. Must be a multiple of 8 (byte alignment of
# chunk boundaries for every width). 2^18 values * 32 bits = 1 MiB packed,
# ~16 MiB transient uint8 bit matrix at width 64 — bounded regardless of
# partition size.
_CHUNK = 1 << 18

_MAX_NEST_DEPTH = 3


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------


def pack_uint(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into ``width`` bits each (MSB first)."""
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    vals = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    parts = []
    for i in range(0, n, _CHUNK):
        chunk = vals[i : i + _CHUNK]
        bits = ((chunk[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        parts.append(np.packbits(bits.ravel()).tobytes())
    return b"".join(parts)


def unpack_uint(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uint`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    for i in range(0, n, _CHUNK):
        m = min(_CHUNK, n - i)
        bit_start = i * width  # multiple of 8: _CHUNK % 8 == 0
        nbits = m * width
        nbytes = (nbits + 7) // 8
        chunk = raw[bit_start // 8 : bit_start // 8 + nbytes]
        bits = np.unpackbits(chunk, count=nbits).reshape(m, width)
        out[i : i + m] = (bits.astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
    return out


def _width(lo: int, hi: int) -> int:
    """Bits needed for values in [lo, hi] after subtracting lo."""
    return int(hi - lo).bit_length()


def _packed_bytes(n: int, width: int) -> int:
    return (n * width + 7) // 8


def _plain_itemsize(vmin: int, vmax: int) -> int:
    return 4 if (vmin >= -(2**31) and vmax < 2**31) else 8


# ---------------------------------------------------------------------------
# statistics + selection
# ---------------------------------------------------------------------------


def analyze_int(vals: np.ndarray) -> dict:
    """Exact per-buffer statistics driving codec selection.

    Returns n, vmin, vmax, n_runs, n_distinct, and the exact encoded size
    each candidate codec would produce — selection is a pure argmin, fully
    deterministic and unit-testable.
    """
    v = np.asarray(vals)
    n = len(v)
    if n == 0:
        return {
            "n": 0,
            "vmin": 0,
            "vmax": 0,
            "n_runs": 0,
            "n_distinct": 0,
            "mean_run_len": 0.0,
            "sizes": {"plain": 10},
        }
    v64 = v.astype(np.int64, copy=False)
    vmin = int(v64.min())
    vmax = int(v64.max())
    change = np.flatnonzero(np.diff(v64))
    n_runs = len(change) + 1
    card = len(np.unique(v64))

    sizes: dict[str, int] = {}
    sizes["plain"] = 10 + _plain_itemsize(vmin, vmax) * n
    w_for = _width(vmin, vmax)
    sizes["for"] = 18 + _packed_bytes(n, w_for)

    if n >= 2:
        d = np.diff(v64)
        w_d = _width(int(d.min()), int(d.max()))
        # DELTA = header(17) + nested-len(8) + FOR blob of n-1 diffs
        sizes["delta"] = 17 + 8 + 18 + _packed_bytes(n - 1, w_d)

    if n_runs < n:
        run_lens = np.diff(np.r_[0, change + 1, n])
        w_rl = _width(int(run_lens.min()), int(run_lens.max()))
        sizes["rle"] = (
            9
            + 8
            + 18
            + _packed_bytes(n_runs, w_for)  # run values share the range
            + 8
            + 18
            + _packed_bytes(n_runs, w_rl)
        )

    if card < n:
        w_codes = max(card - 1, 0).bit_length()
        # dictionary itself conservatively sized as a FOR blob
        dict_blob = 18 + _packed_bytes(card, w_for)
        sizes["dict"] = 14 + 8 + dict_blob + _packed_bytes(n, w_codes)

    return {
        "n": n,
        "vmin": vmin,
        "vmax": vmax,
        "n_runs": n_runs,
        "n_distinct": card,
        "mean_run_len": n / n_runs,
        "sizes": sizes,
    }


def select_int_codec(vals: np.ndarray) -> str:
    """Pick the codec with the smallest exact encoded size (deterministic)."""
    sizes = analyze_int(vals)["sizes"]
    order = {"for": 0, "rle": 1, "dict": 2, "delta": 3, "plain": 4}
    return min(sizes, key=lambda k: (sizes[k], order[k]))


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_int(vals: np.ndarray, codec: str, _depth: int = 0) -> bytes:
    """Encode an integer array (int64-safe) with a specific codec."""
    v = np.asarray(vals).astype(np.int64, copy=False)
    n = len(v)
    if codec == "plain":
        itemsize = 4 if n == 0 else _plain_itemsize(int(v.min()), int(v.max()))
        payload = v.astype("<i4" if itemsize == 4 else "<i8").tobytes()
        return struct.pack("<BQB", CODEC_PLAIN, n, itemsize) + payload
    if codec == "for":
        if n == 0:
            return struct.pack("<BQqB", CODEC_FOR, 0, 0, 0)
        ref = int(v.min())
        w = _width(ref, int(v.max()))
        return struct.pack("<BQqB", CODEC_FOR, n, ref, w) + pack_uint(
            (v - ref).astype(np.uint64), w
        )
    if codec == "delta":
        if n < 2:
            return encode_int(v, "plain")
        first = int(v[0])
        nested = _encode_nested(np.diff(v), _depth + 1)
        return struct.pack("<BQq", CODEC_DELTA, n, first) + nested
    if codec == "rle":
        if n == 0:
            return encode_int(v, "plain")
        change = np.flatnonzero(np.diff(v))
        starts = np.r_[0, change + 1]
        run_vals = v[starts]
        run_lens = np.diff(np.r_[starts, n])
        return (
            struct.pack("<BQ", CODEC_RLE, n)
            + _encode_nested(run_vals, _depth + 1)
            + _encode_nested(run_lens, _depth + 1)
        )
    if codec == "dict":
        if n == 0:
            return encode_int(v, "plain")
        uniq, codes = np.unique(v, return_inverse=True)
        card = len(uniq)
        w_codes = max(card - 1, 0).bit_length()
        return (
            struct.pack("<BQIB", CODEC_DICT, n, card, w_codes)
            + _encode_nested(uniq, _depth + 1)
            + pack_uint(codes.astype(np.uint64), w_codes)
        )
    raise ValueError(f"unknown integer codec: {codec!r}")


def _encode_nested(vals: np.ndarray, depth: int) -> bytes:
    blob = encode_int_best(vals, _depth=depth)
    return struct.pack("<Q", len(blob)) + blob


def encode_int_best(vals: np.ndarray, _depth: int = 0) -> bytes:
    """Auto-select the codec by exact size and encode (the hot path)."""
    if _depth >= _MAX_NEST_DEPTH:
        v = np.asarray(vals)
        if len(v) == 0:
            return encode_int(v, "plain")
        v64 = v.astype(np.int64, copy=False)
        vmin, vmax = int(v64.min()), int(v64.max())
        sz_for = 18 + _packed_bytes(len(v), _width(vmin, vmax))
        sz_plain = 10 + _plain_itemsize(vmin, vmax) * len(v)
        return encode_int(v, "for" if sz_for < sz_plain else "plain")
    return encode_int(vals, select_int_codec(vals), _depth=_depth)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_int(blob: bytes) -> np.ndarray:
    """Decode any integer blob back to int64, bit-identical to the source."""
    out, _ = _decode_at(memoryview(blob), 0)
    return out


def _decode_at(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    codec_id = buf[off]
    if codec_id == CODEC_PLAIN:
        n, itemsize = struct.unpack_from("<QB", buf, off + 1)
        start = off + 10
        end = start + itemsize * n
        dt = "<i4" if itemsize == 4 else "<i8"
        return np.frombuffer(buf[start:end], dtype=dt).astype(np.int64), end
    if codec_id == CODEC_FOR:
        n, ref, w = struct.unpack_from("<QqB", buf, off + 1)
        start = off + 18
        nbytes = _packed_bytes(n, w)
        u = unpack_uint(bytes(buf[start : start + nbytes]), n, w)
        return u.astype(np.int64) + ref, start + nbytes
    if codec_id == CODEC_DELTA:
        n, first = struct.unpack_from("<Qq", buf, off + 1)
        diffs, end = _decode_nested(buf, off + 17)
        v = np.empty(n, dtype=np.int64)
        v[0] = first
        if n > 1:
            np.cumsum(diffs, out=v[1:])
            v[1:] += first
        return v, end
    if codec_id == CODEC_RLE:
        (n,) = struct.unpack_from("<Q", buf, off + 1)
        run_vals, mid = _decode_nested(buf, off + 9)
        run_lens, end = _decode_nested(buf, mid)
        return np.repeat(run_vals, run_lens), end
    if codec_id == CODEC_DICT:
        n, card, w_codes = struct.unpack_from("<QIB", buf, off + 1)
        uniq, mid = _decode_nested(buf, off + 14)
        nbytes = _packed_bytes(n, w_codes)
        codes = unpack_uint(bytes(buf[mid : mid + nbytes]), n, w_codes)
        return uniq[codes.astype(np.int64)], mid + nbytes
    raise ValueError(f"unknown codec id {codec_id} at offset {off}")


def _decode_nested(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (length,) = struct.unpack_from("<Q", buf, off)
    start = off + 8
    vals, _ = _decode_at(buf, start)
    return vals, start + length


def codec_of(blob: bytes) -> str:
    """Name of the top-level codec in a blob (for the manifest)."""
    return CODEC_NAMES[blob[0]]
