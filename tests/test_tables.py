"""Table-layer tests: quantization scaling/reciprocals, Huffman code
construction, K.2 optimizer properties.

Mirrors the reference's table unit tests (quantization.rs:310-339,
huffman.rs construction per Annex C)."""

import numpy as np
import pytest

from tpuenc.core import tables


def test_zigzag_is_permutation():
    assert sorted(tables.ZIGZAG.tolist()) == list(range(64))
    # Spot values from Figure A.6.
    assert tables.ZIGZAG[0] == 0
    assert tables.ZIGZAG[1] == 1
    assert tables.ZIGZAG[2] == 8
    assert tables.ZIGZAG[63] == 63


def test_quality_100_default_is_identity():
    # quantization.rs:314-328: at quality 100 every premultiplied value is 8.
    for luma in (True, False):
        t = tables.quantization_table("default", 100, luma)
        assert (t.values == 8).all()
        assert (t.dqt_values() == 1).all()


def test_quality_100_quantize_identity():
    # quantization.rs:331-338: quantize(i << 3) == i at quality 100.
    t = tables.quantization_table("default", 100, True)
    v = np.arange(-255, 255, dtype=np.int32)
    scaled = v << 3
    absv = np.abs(scaled)
    q = ((absv + t.corrections[0]) * t.reciprocals[0]) >> tables.QUANT_SHIFT
    q = np.where(scaled < 0, -q, q)
    np.testing.assert_array_equal(q, v)


def test_reciprocal_division_properties():
    # The reference's multiply-shift (quantization.rs:185-207) approximates
    # round-half-away division: exact for power-of-two divisors, within
    # 1 ulp everywhere in the DCT output range, and odd-symmetric.
    for divisor in [8, 16, 24, 88, 792, 1040, 2040, 16384]:
        r, c = tables._compute_reciprocal(divisor)
        v = np.arange(-16384, 16385)
        got = ((np.abs(v) + c) * r) >> tables.QUANT_SHIFT
        got = np.where(v < 0, -got, got)
        want = np.sign(v) * ((np.abs(v) + divisor // 2) // divisor)
        assert np.abs(got - want).max() <= 1, divisor
        np.testing.assert_array_equal(got, -got[::-1])  # odd symmetry
        if divisor & (divisor - 1) == 0:
            np.testing.assert_array_equal(got, want)


def test_quality_scaling_formula():
    # libjpeg scaling at q50 is identity on the base table.
    t = tables.quantization_table("default", 50, True)
    base = np.asarray(tables.LUMA_PRESETS["default"])
    np.testing.assert_array_equal(t.values >> 3, base)
    # q25 doubles (5000/25 = 200).
    t25 = tables.quantization_table("default", 25, True)
    np.testing.assert_array_equal(
        t25.values >> 3, np.clip((base * 200 + 50) // 100, 1, 255)
    )


def test_custom_table_clamping():
    t = tables.quantization_table(tuple([0] * 32 + [5000] * 32), 80, True)
    assert (t.values[:32] == 8).all()       # clamped to 1, x8
    assert (t.values[32:] == 2048 << 3).all()  # clamped to 2048, x8


def test_all_presets_resolve():
    for name in tables.QUANT_PRESET_NAMES:
        for luma in (True, False):
            t = tables.quantization_table(name, 75, luma)
            assert t.values.shape == (64,)
            assert (t.values >= 8).all()


def _codes_are_prefix_free(table):
    codes = [
        (int(table.sizes[v]), int(table.codes[v]))
        for v in range(256)
        if table.sizes[v] > 0
    ]
    for i, (s1, c1) in enumerate(codes):
        for j, (s2, c2) in enumerate(codes):
            if i != j and s1 <= s2:
                assert (c2 >> (s2 - s1)) != c1, "prefix violation"


def test_default_huffman_tables():
    (ldc, lac), (cdc, cac) = tables.default_tables()
    # K.3 luma DC: symbol 0 has code length 2 and code 0.
    assert ldc.sizes[0] == 2 and ldc.codes[0] == 0
    # All 12 DC symbols present.
    assert all(ldc.sizes[s] > 0 for s in range(12))
    assert all(cdc.sizes[s] > 0 for s in range(12))
    # AC tables carry 162 values.
    assert len(lac.values) == 162 and len(cac.values) == 162
    _codes_are_prefix_free(ldc)
    _codes_are_prefix_free(lac)


def test_optimized_table_basic():
    freq = np.zeros(257, dtype=np.int64)
    freq[256] = 1
    freq[0] = 1000
    freq[1] = 500
    freq[2] = 100
    freq[0xF0] = 10
    t = tables.optimized_huffman_table(freq)
    # All symbols with nonzero freq get codes, most frequent shortest.
    assert t.sizes[0] > 0 and t.sizes[1] > 0 and t.sizes[2] > 0 and t.sizes[0xF0] > 0
    assert t.sizes[0] <= t.sizes[1] <= t.sizes[2] <= t.sizes[0xF0]
    assert max(t.sizes[v] for v in t.values) <= 16
    _codes_are_prefix_free(t)


def test_optimized_table_degenerate_single_symbol():
    # 1x1 image regression analog (lib.rs:542-553): a single DC symbol plus
    # the reserved bin must still build a valid table.
    freq = np.zeros(257, dtype=np.int64)
    freq[256] = 1
    freq[5] = 1
    t = tables.optimized_huffman_table(freq)
    assert t.sizes[5] > 0
    # No code may be all ones (reserved symbol guarantee).
    s, c = int(t.sizes[5]), int(t.codes[5])
    assert c != (1 << s) - 1


def test_optimized_table_length_limit():
    # Exponential frequencies force deep trees; K.3 limiting must cap at 16.
    freq = np.zeros(257, dtype=np.int64)
    freq[256] = 1
    for i in range(40):
        freq[i] = 1 << i if i < 30 else 1
    t = tables.optimized_huffman_table(freq)
    assert max(t.sizes[v] for v in t.values) <= 16
    _codes_are_prefix_free(t)


def test_native_k2_matches_python_oracle():
    """The native C++ Annex K.2 builder (entropy.cpp tpuenc_build_k2) must
    produce identical (lengths, values) to the pure-Python oracle for any
    histogram, including degenerate and tie-heavy ones."""
    import numpy as np

    from tpuenc.entropy import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(1234)
    cases = []
    for _ in range(200):
        freq = np.zeros(257, np.int64)
        n = int(rng.integers(1, 257))
        idx = rng.choice(256, n, replace=False)
        freq[idx] = rng.integers(1, 1 << int(rng.integers(1, 40)), n)
        freq[256] = 1
        cases.append(freq)
    # Tie-heavy: all-equal frequencies exercise the largest-index rule.
    flat = np.zeros(257, np.int64)
    flat[:64] = 7
    flat[256] = 1
    cases.append(flat)
    # Single symbol + reserved.
    single = np.zeros(257, np.int64)
    single[5] = 100
    single[256] = 1
    cases.append(single)

    for freq in cases:
        a = tables.optimized_huffman_table(freq)
        b = tables._optimized_huffman_table_py(freq)
        assert a.lengths == b.lengths
        assert a.values == b.values
