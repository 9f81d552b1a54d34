"""FSST symbol-table compression for byte strings, from scratch.

Implements the published algorithm (Boncz, Neumann, Leis — "FSST: Fast
Random Access String Compression", PVLDB 13(11), 2020): a table of up to 255
symbols of 1..8 bytes is trained by iterative generations on a sample
(count symbol and symbol-pair frequencies under the current table, keep the
highest-gain candidates), then the data is encoded greedily longest-match;
byte values with no symbol are emitted as an escape code + literal byte.

The reference repo never implements this itself — its string compression is
whatever Parquet/ZSTD does (reference ``src/etl/load.py:44-48``).  Here FSST
handles the ``doc_id`` / ``source`` string columns of the token table.

Blob layout (little-endian)::

    [u8 codec_id=5][u64 raw_len][u8 n_symbols]
    [n_symbols * u8 symbol_len][concatenated symbol bytes]
    [u64 payload_len][payload codes]

Payload codes: ``0..n_symbols-1`` index the table; ``255`` escapes the next
literal byte.
"""

from __future__ import annotations

import struct
from collections import Counter

CODEC_FSST = 5
CODE_ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
GENERATIONS = 5
SAMPLE_TARGET = 1 << 14  # 16 KiB training sample


def _sample(data: bytes) -> bytes:
    """Deterministic, representative sample: 16 evenly spaced 1 KiB slices."""
    if len(data) <= SAMPLE_TARGET:
        return data
    n_slices = 16
    step = len(data) // n_slices
    piece = SAMPLE_TARGET // n_slices
    return b"".join(data[i * step : i * step + piece] for i in range(n_slices))


def _index(symbols: list[bytes]) -> dict[int, list[tuple[bytes, int]]]:
    """First-byte index, candidates sorted longest-first for greedy match."""
    by_first: dict[int, list[tuple[bytes, int]]] = {}
    for code, sym in enumerate(symbols):
        by_first.setdefault(sym[0], []).append((sym, code))
    for lst in by_first.values():
        lst.sort(key=lambda t: -len(t[0]))
    return by_first


def build_table(data: bytes) -> list[bytes]:
    """Train a symbol table on a sample of ``data`` (iterative generations)."""
    sample = _sample(data)
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(GENERATIONS):
        by_first = _index(symbols)
        count1: Counter = Counter()
        count2: Counter = Counter()
        pos = 0
        prev: bytes | None = None
        n = len(sample)
        while pos < n:
            sym = None
            for cand, _code in by_first.get(sample[pos], ()):
                if sample.startswith(cand, pos):
                    sym = cand
                    break
            if sym is None:
                sym = sample[pos : pos + 1]
            count1[sym] += 1
            if prev is not None and len(prev) + len(sym) <= MAX_SYM_LEN:
                count2[prev + sym] += 1
            prev = sym
            pos += len(sym)
        gains: Counter = Counter()
        for sym, c in count1.items():
            gains[sym] += c * len(sym)
        for cat, c in count2.items():
            gains[cat] += c * len(cat)
        # deterministic: gain desc, then bytes asc as tie-break
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        symbols = [sym for sym, _g in ranked[:MAX_SYMBOLS]]
    return symbols


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    """Greedy longest-match encode of ``data`` against ``symbols``."""
    by_first = _index(symbols)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        for sym, code in by_first.get(data[pos], ()):
            if data.startswith(sym, pos):
                out.append(code)
                pos += len(sym)
                break
        else:
            out.append(CODE_ESCAPE)
            out.append(data[pos])
            pos += 1
    return bytes(out)


def decompress(payload: bytes, symbols: list[bytes], raw_len: int) -> bytes:
    """Inverse of :func:`compress`."""
    out = bytearray(raw_len)
    i = 0
    w = 0
    n = len(payload)
    while i < n:
        c = payload[i]
        if c == CODE_ESCAPE:
            out[w] = payload[i + 1]
            w += 1
            i += 2
        else:
            sym = symbols[c]
            out[w : w + len(sym)] = sym
            w += len(sym)
            i += 1
    return bytes(out)


def encode_fsst(data: bytes) -> bytes:
    """Full blob: train table on a sample, compress, serialize table+payload."""
    symbols = build_table(data)
    payload = compress(data, symbols)
    head = struct.pack("<BQB", CODEC_FSST, len(data), len(symbols))
    lens = bytes(len(s) for s in symbols)
    table = b"".join(symbols)
    return head + lens + table + struct.pack("<Q", len(payload)) + payload


def decode_fsst(blob: bytes | memoryview, off: int = 0) -> tuple[bytes, int]:
    """Decode a blob produced by :func:`encode_fsst`; returns (data, end)."""
    buf = memoryview(blob)
    codec_id, raw_len, n_symbols = struct.unpack_from("<BQB", buf, off)
    if codec_id != CODEC_FSST:
        raise ValueError(f"not an FSST blob (codec id {codec_id})")
    p = off + 10
    lens = list(buf[p : p + n_symbols])
    p += n_symbols
    symbols = []
    for ln in lens:
        symbols.append(bytes(buf[p : p + ln]))
        p += ln
    (payload_len,) = struct.unpack_from("<Q", buf, p)
    p += 8
    data = decompress(bytes(buf[p : p + payload_len]), symbols, raw_len)
    return data, p + payload_len


def estimate_ratio(data: bytes) -> float:
    """Compressed/raw ratio estimated on the training sample (cheap gate
    before committing to a full-buffer compress)."""
    sample = _sample(data)
    if not sample:
        return 1.0
    symbols = build_table(sample)
    comp = compress(sample, symbols)
    table_overhead = 10 + len(symbols) + sum(len(s) for s in symbols) + 8
    return (len(comp) + table_overhead) / max(len(sample), 1)
