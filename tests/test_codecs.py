"""Round-trip + selection tests for the codec kernels.

Mirrors the reference's unit-test philosophy (reference
``tests/test_transform.py``, ``tests/test_validate.py``: each rule gets
pass+fail adversarial cases) applied to our codecs: the north-rule invariant
is bit-identical decode on every input, including degenerate ones.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_sql_duckdb_parquet__spark.codecs import (
    analyze_int,
    decode_int,
    decode_strings,
    encode_int,
    encode_int_best,
    encode_strings,
    select_int_codec,
)
from etl_sql_duckdb_parquet__spark.codecs.core import codec_of, pack_uint, unpack_uint
from etl_sql_duckdb_parquet__spark.codecs.fsst import (
    build_table,
    compress,
    decode_fsst,
    decompress,
    encode_fsst,
)

I32 = np.int32
INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1

RNG = np.random.default_rng(42)

ADVERSARIAL = {
    "empty": np.array([], dtype=I32),
    "single": np.array([7], dtype=I32),
    "single_min": np.array([INT32_MIN], dtype=I32),
    "constant": np.full(1000, 42, dtype=I32),
    "constant_zero": np.zeros(999, dtype=I32),
    "two_values": np.array([INT32_MIN, INT32_MAX], dtype=I32),
    "full_range": RNG.integers(INT32_MIN, INT32_MAX, 5000, endpoint=True).astype(I32),
    "negatives": -RNG.integers(0, 1000, 2000).astype(I32),
    "sorted": np.sort(RNG.integers(0, 10**9, 3000)).astype(I32),
    "sorted_desc": np.sort(RNG.integers(0, 10**9, 3000))[::-1].astype(I32),
    "runs": np.repeat(RNG.integers(0, 50, 100), RNG.integers(1, 200, 100)).astype(I32),
    "low_card": RNG.integers(0, 7, 10000).astype(I32),
    "high_card": RNG.integers(0, 2**30, 10000).astype(I32),
    "zipf_tokens": np.minimum(RNG.zipf(1.3, 20000), 50257).astype(I32) - 1,
    "alternating": np.tile([0, 1], 5000).astype(I32),
    "boundary_runs": np.repeat([INT32_MIN, 0, INT32_MAX], 100).astype(I32),
}


@pytest.mark.parametrize("name", sorted(ADVERSARIAL))
@pytest.mark.parametrize("codec", ["plain", "for", "delta", "rle", "dict", "varint", "vardict", "forblock"])
def test_roundtrip_every_codec(name, codec):
    vals = ADVERSARIAL[name]
    decoded = decode_int(encode_int(vals, codec))
    np.testing.assert_array_equal(decoded.astype(np.int64), vals.astype(np.int64))


@pytest.mark.parametrize("name", sorted(ADVERSARIAL))
def test_roundtrip_auto(name):
    vals = ADVERSARIAL[name]
    blob = encode_int_best(vals)
    decoded = decode_int(blob)
    np.testing.assert_array_equal(decoded.astype(np.int64), vals.astype(np.int64))


def test_auto_never_bigger_than_plain():
    for name, vals in ADVERSARIAL.items():
        best = len(encode_int_best(vals))
        plain = len(encode_int(vals, "plain"))
        assert best <= plain, f"{name}: auto {best} > plain {plain}"


def test_selector_picks_sensible_codecs():
    assert select_int_codec(ADVERSARIAL["constant"]) in ("for", "rle")
    # long runs → rle
    assert select_int_codec(ADVERSARIAL["runs"]) == "rle"
    # sorted ascending → delta wins (tiny diffs)
    assert select_int_codec(ADVERSARIAL["sorted"]) == "delta"
    # low cardinality, wide range → dict or small-width for
    low_wide = (RNG.integers(0, 5, 5000) * 10**8).astype(I32)
    assert select_int_codec(low_wide) == "dict"


def test_analyze_sizes_are_exact():
    """Selection is only sound if predicted sizes equal actual sizes."""
    for name, vals in ADVERSARIAL.items():
        stats = analyze_int(vals)
        for codec, predicted in stats["sizes"].items():
            actual = len(encode_int(vals, codec))
            # nested blobs are auto-selected, so predictions for delta/rle/
            # dict are upper bounds (nested FOR assumed); plain & for exact
            if codec in ("plain", "for", "varint", "forblock"):
                assert actual == predicted, (name, codec, actual, predicted)
            else:
                assert actual <= predicted, (name, codec, actual, predicted)


def test_compression_wins_on_token_like_data():
    toks = ADVERSARIAL["zipf_tokens"]
    ratio = len(encode_int_best(toks)) / (4 * len(toks))
    assert ratio < 0.7, f"expected <0.7 raw ratio on zipf tokens, got {ratio:.3f}"


def test_blob_is_self_describing():
    vals = ADVERSARIAL["runs"]
    blob = encode_int_best(vals)
    assert codec_of(blob) == "rle"


@given(
    st.lists(st.integers(min_value=INT32_MIN, max_value=INT32_MAX), max_size=300),
    st.sampled_from(["plain", "for", "delta", "rle", "dict", "varint", "vardict", "forblock"]),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(xs, codec):
    vals = np.array(xs, dtype=I32)
    decoded = decode_int(encode_int(vals, codec))
    np.testing.assert_array_equal(decoded.astype(np.int64), vals.astype(np.int64))


@given(st.integers(0, 64), st.lists(st.integers(0, 2**63 - 1), max_size=100))
@settings(max_examples=100, deadline=None)
def test_pack_unpack_property(width, xs):
    lim = (1 << width) if width < 64 else 2**64
    vals = np.array([x % lim for x in xs], dtype=np.uint64)
    out = unpack_uint(pack_uint(vals, width), len(vals), width)
    np.testing.assert_array_equal(out, vals)


# ---------------------------------------------------------------------------
# FSST
# ---------------------------------------------------------------------------

FSST_CASES = {
    "empty": b"",
    "one_byte": b"x",
    "repetitive": b"doc_000123" * 500,
    "ids": b"".join(f"doc_{i:08d}".encode() for i in range(2000)),
    "urls": b"".join(
        f"https://example.com/page/{i}?ref=abc".encode() for i in range(500)
    ),
    "random": bytes(RNG.integers(0, 256, 4096, dtype=np.uint8)),
    "all_escapes": bytes(range(256)) * 4,
    "long_runs": b"a" * 10000,
    "utf8": ("żółć🎉日本語 " * 300).encode("utf-8"),
}


@pytest.mark.parametrize("name", sorted(FSST_CASES))
def test_fsst_roundtrip(name):
    data = FSST_CASES[name]
    decoded, _ = decode_fsst(encode_fsst(data))
    assert decoded == data


def test_fsst_compresses_ids():
    data = FSST_CASES["ids"]
    blob = encode_fsst(data)
    assert len(blob) < 0.6 * len(data), f"FSST ratio {len(blob)/len(data):.2f}"


def test_zunwrap_rejects_truncated_blob():
    import struct
    import zlib

    from etl_sql_duckdb_parquet__spark.codecs.core import (
        CODEC_ZWRAP,
        zunwrap,
    )

    inner = b"payload-bytes" * 10
    z = zlib.compress(inner)
    # header lies: claims one byte more than the payload decompresses to
    bad = struct.pack("<BQQ", CODEC_ZWRAP, len(inner) + 1, len(z)) + z
    with pytest.raises(ValueError, match="zwrap blob corrupt"):
        zunwrap(bad)


def test_fsst_throughput_vectorized():
    """Regression guard for the vectorized kernels: 10 MB must compress in
    seconds, not minutes (the old per-byte Python loop ran ~0.3-0.5 MB/s;
    warm best-of-N on this host is ~11-14 MB/s compress on this exact
    input, ~100 MB/s decompress — see the fsst module docstring for the
    four benchmarked redesigns that could not beat it).  The compress
    floor is ~2.3x below warm speed; since this sandbox's tenant-steal
    windows can persist for minutes (CLAUDE.md), best-of-5 escalates to
    best-of-15 before failing rather than flaking a full-suite run on a
    slow window."""
    import time

    data = b"\x00".join(
        f"web-crawl-{i % 500:04d}/doc_{i:08d}".encode() for i in range(400_000)
    )[: 10 * 1024 * 1024]
    mb = len(data) / 2**20
    best_c = best_d = float("inf")
    iters = 0
    while iters < 15:
        t0 = time.time()
        blob = encode_fsst(data)
        t1 = time.time()
        decoded, _ = decode_fsst(blob)
        t2 = time.time()
        assert decoded == data
        best_c = min(best_c, t1 - t0)
        best_d = min(best_d, t2 - t1)
        iters += 1
        if iters >= 5 and mb / best_c > 5.0 and mb / best_d > 15.0:
            break
    assert mb / best_c > 5.0, f"compress {mb/best_c:.2f} MB/s"
    assert mb / best_d > 15.0, f"decompress {mb/best_d:.2f} MB/s"
    assert len(blob) < 0.5 * len(data)


def test_fsst_selector_pays_for_its_throughput_cost():
    """Round-5 cost guard: the FSST kernel runs ~10-25× slower than the
    zstd-L1 wrap that a PLAIN buffer gets anyway, so the selector must
    pick FSST only when its sampled size win over zstd-on-plain clears
    the documented ≥10% threshold (decision table in codecs/strings.py)."""
    from etl_sql_duckdb_parquet__spark.codecs import strings as S

    # the decision function IS the documented table
    assert S._fsst_pays(0.50, 0.90) is True
    assert S._fsst_pays(0.85, 0.90) is False  # zstd within 10% → PLAIN
    assert S._fsst_pays(0.95, 0.40) is False  # zstd crushes it → PLAIN
    assert S._fsst_pays(0.36, 0.40) is True  # exactly at the threshold

    # string-heavy repetitive text: zstd-L1 compresses it at wire speed,
    # so the selector must go PLAIN (the old vs-plain gate picked FSST
    # here and burned ~10× encode throughput for no net size win after
    # the entropy wrap)
    text = b"".join(
        f"https://example.com/page/{i}?ref=abc".encode() for i in range(500)
    )
    z_ratio = S._zstd_sampled_ratio(text)
    if z_ratio is None:  # pyarrow without zstd: the plain-gate fallback
        pytest.skip("pyarrow lacks the zstd codec on this host")
    assert z_ratio < 0.5  # zstd really does crush it
    blob = S.encode_bytes_best(text)
    assert blob[0] == S.CODEC_PLAINBYTES
    got, _ = S.decode_bytes(blob)
    assert got == text

    # when zstd genuinely can't touch the data but FSST can (forced via
    # the sampled-ratio seam), FSST is still selected — the wiring keeps
    # both outcomes reachable and the round-trip intact
    orig = S._zstd_sampled_ratio
    S._zstd_sampled_ratio = lambda sample: 1.0
    try:
        blob = S.encode_bytes_best(text)
        assert blob[0] == S.CODEC_FSST
        got, _ = S.decode_bytes(blob)
        assert got == text
    finally:
        S._zstd_sampled_ratio = orig


def test_fsst_table_respects_limits():
    table = build_table(FSST_CASES["urls"])
    assert len(table) <= 255
    assert all(1 <= len(s) <= 8 for s in table)
    payload = compress(FSST_CASES["urls"], table)
    assert decompress(payload, table, len(FSST_CASES["urls"])) == FSST_CASES["urls"]


# ---------------------------------------------------------------------------
# string arrays
# ---------------------------------------------------------------------------

STRING_CASES = {
    "empty": [],
    "one": ["doc_1"],
    "ids": [f"doc_{i:08d}" for i in range(3000)],
    "low_card": ["web", "books", "code", "wiki"] * 800,
    "mixed_len": ["", "a", "ab" * 50, "x" * 999],
    "unicode": ["żółć", "日本語", "🎉emoji", "plain"] * 100,
}


@pytest.mark.parametrize("name", sorted(STRING_CASES))
def test_strings_roundtrip(name):
    vals = STRING_CASES[name]
    assert decode_strings(encode_strings(vals)) == vals


def test_strdict_picked_for_low_cardinality():
    blob = encode_strings(STRING_CASES["low_card"])
    assert blob[0] == 8  # CODEC_STRDICT
    raw = sum(len(s.encode()) for s in STRING_CASES["low_card"])
    assert len(blob) < 0.2 * raw


@given(st.lists(st.text(max_size=40), max_size=120))
@settings(max_examples=100, deadline=None)
def test_strings_roundtrip_property(vals):
    assert decode_strings(encode_strings(vals)) == vals


def test_pattern_id_roundtrip_and_size():
    ids = [f"doc_{i:010d}" for i in range(5000)]
    blob = encode_strings(ids)
    assert blob[0] == 12  # CODEC_PATTERNID
    assert decode_strings(blob) == ids
    assert len(blob) < 0.02 * sum(len(s) for s in ids)
    # shuffled (non-sequential) still pattern-encodable
    shuffled = [ids[(i * 2654435761) % 5000] for i in range(5000)]
    blob2 = encode_strings(shuffled)
    assert decode_strings(blob2) == shuffled


def test_pattern_id_rejects_non_uniform():
    for vals in (
        ["doc_1", "doc_22"],            # ragged width
        ["doc_01", "dud_02"],           # prefix mismatch
        ["doc_aa", "doc_bb"],           # no digit suffix
        [],
    ):
        blob = encode_strings(vals)
        assert decode_strings(blob) == vals
        assert blob[0] != 12


def test_zwrap_roundtrip_and_gate():
    import numpy as np

    from etl_sql_duckdb_parquet__spark.codecs.core import (
        CODEC_ZSTD,
        CODEC_ZWRAP,
        decode_int,
        encode_int_best,
        zunwrap,
        zwrap_best,
    )

    rng = np.random.default_rng(3)
    # skewed data: light codec leaves entropy → zwrap should engage
    # (ZSTD when pyarrow provides it, DEFLATE fallback otherwise)
    x = np.floor(50257 * rng.random(200_000) ** 3).astype(np.int64)
    blob = encode_int_best(x)
    wrapped = zwrap_best(blob)
    assert wrapped[0] in (CODEC_ZSTD, CODEC_ZWRAP) and len(wrapped) < len(blob)
    assert zunwrap(wrapped) == blob
    assert np.array_equal(decode_int(wrapped), x)
    # incompressible-ish data: gate must refuse (blob returned unchanged)
    y = rng.integers(0, 2**31, 50_000).astype(np.int64)
    blob_y = encode_int_best(y)
    assert np.array_equal(decode_int(zwrap_best(blob_y)), y)


def test_zwrap_explicit_level_and_deflate_fallback(monkeypatch):
    """zstd_level is honored (not silently pyarrow's default), and when
    pyarrow lacks zstd the writer emits DEFLATE blobs that round-trip."""
    import numpy as np

    from etl_sql_duckdb_parquet__spark.codecs import core

    rng = np.random.default_rng(11)
    x = np.floor(50257 * rng.random(200_000) ** 3).astype(np.int64)
    blob = core.encode_int_best(x)
    for lvl in (1, 3):
        wrapped = core.zwrap_best(blob, zstd_level=lvl)
        assert core.zunwrap(wrapped) == blob
        assert np.array_equal(core.decode_int(wrapped), x)

    # environment without pyarrow zstd: writer falls back to DEFLATE
    monkeypatch.setattr(core, "_zstd_codec", lambda: None)
    wrapped = core.zwrap_best(blob)
    assert wrapped[0] == core.CODEC_ZWRAP and len(wrapped) < len(blob)
    assert np.array_equal(core.decode_int(wrapped), x)
    # and a CODEC_ZSTD blob in that environment raises the documented
    # environment-requirement error (no `zstandard` package here)
    import struct

    fake = struct.pack("<BQQ", core.CODEC_ZSTD, len(blob), 4) + b"\x00" * 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no zstd decoder"):
        core.zunwrap(fake)


def test_zwrap_legacy_deflate_blobs_still_decode():
    """Blobs written by the round-1 DEFLATE wrap must keep decoding after
    the switch to ZSTD (manifest resume can mix blob generations)."""
    import struct
    import zlib

    import numpy as np

    from etl_sql_duckdb_parquet__spark.codecs.core import (
        CODEC_ZWRAP,
        decode_int,
        encode_int_best,
    )

    x = np.arange(10_000, dtype=np.int64) % 97
    inner = encode_int_best(x)
    z = zlib.compress(inner, 6)
    legacy = struct.pack("<BQQ", CODEC_ZWRAP, len(inner), len(z)) + z
    assert np.array_equal(decode_int(legacy), x)


def test_zwrap_strings_dispatch():
    from etl_sql_duckdb_parquet__spark.codecs import decode_strings, encode_strings
    from etl_sql_duckdb_parquet__spark.codecs.core import zwrap_best

    vals = [f"user_{i % 7}@example.com" for i in range(5000)]
    blob = encode_strings(vals)
    assert decode_strings(zwrap_best(blob)) == vals
