"""Entropy-layer tests: symbolization, bit packing, native-vs-oracle parity,
histograms (reference tests: encoder.rs:1286-1300 get_num_bits/get_code
agreement; writer semantics pinned by decode round-trips)."""

import numpy as np
import pytest

from tpuenc.core.tables import default_tables
from tpuenc.entropy import native
from tpuenc.entropy.bitpack import BitWriter, encode_scan
from tpuenc.entropy.huffopt import build_histograms, progressive_bands
from tpuenc.entropy.symbols import ac_symbols, bit_length, get_code


def test_get_code_agreement():
    # Mirrors encoder.rs:1286-1300: bit_length and get_code sizes agree
    # over +-2^13.
    v = np.arange(-(1 << 13), (1 << 13) + 1, dtype=np.int32)
    size, extra = get_code(v)
    np.testing.assert_array_equal(size, bit_length(v))
    # Positive values: extra == value's low bits; negatives: complement.
    assert tuple(get_code(np.array([0]))) [0][0] == 0
    s, e = get_code(np.array([5]))
    assert (s[0], e[0]) == (3, 5)
    s, e = get_code(np.array([-5]))
    assert (s[0], e[0]) == (3, 2)  # ~5 & 0b111
    s, e = get_code(np.array([-1]))
    assert (s[0], e[0]) == (1, 0)
    s, e = get_code(np.array([1]))
    assert (s[0], e[0]) == (1, 1)


def test_ac_symbols_against_naive():
    rng = np.random.default_rng(3)
    blocks = (
        rng.integers(-50, 50, size=(200, 64))
        * (rng.random((200, 64)) < 0.2)
    ).astype(np.int16)
    for start, end in [(1, 64), (1, 21), (21, 42), (42, 64)]:
        sym = ac_symbols(blocks, start, end)
        for b in range(blocks.shape[0]):
            # Naive serial RLE mirroring writer.rs:356-388.
            run = 0
            naive = []
            for i in range(start, end):
                v = int(blocks[b, i])
                if v == 0:
                    run += 1
                else:
                    zrl = 0
                    while run > 15:
                        zrl += 1
                        run -= 16
                    size = int(bit_length(np.array([v]))[0])
                    naive.append((zrl, (run << 4) | size))
                    run = 0
            naive_eob = run > 0
            got = [
                (int(sym["zrl"][b, i]), int(sym["sym"][b, i]))
                for i in range(end - start)
                if sym["nz"][b, i]
            ]
            assert got == naive, (b, start, end)
            assert bool(sym["eob"][b]) == naive_eob


def test_bitwriter_stuffing_and_padding():
    w = BitWriter()
    w.write_bits(0xFF, 8)
    w.finalize()
    assert w.getvalue() == b"\xff\x00"

    w = BitWriter()
    w.write_bits(0b101, 3)
    w.finalize()  # pad with 1s -> 1011_1111
    assert w.getvalue() == b"\xbf"

    w = BitWriter()
    w.write_bits(0x7F, 7)
    w.write_bits(0x1, 1)  # 0xFF completed across calls
    w.finalize()
    assert w.getvalue() == b"\xff\x00"


@pytest.mark.skipif(not native.available(), reason="native packer not built")
def test_native_matches_oracle_randomized():
    (ldc, lac), (cdc, cac) = default_tables()
    rng = np.random.default_rng(0)
    for trial in range(20):
        B = int(rng.integers(1, 1500))
        blocks = (
            rng.integers(-40, 40, size=(B, 64)) * (rng.random((B, 64)) < 0.15)
        ).astype(np.int16)
        blocks[:, 0] = rng.integers(-200, 200, size=B)
        comp = (
            rng.integers(0, 3, size=B).astype(np.int32) if trial % 2 else None
        )
        dc_tabs = [ldc, cdc, cdc]
        ac_tabs = [lac, cac, cac]
        kw = {}
        t = trial % 5
        if t == 1:
            kw = dict(restart_interval_blocks=int(rng.integers(1, 60)))
        elif t == 2:
            kw = dict(emit_ac=False)
        elif t == 3:
            kw = dict(emit_dc=False, spectral_start=21, spectral_end=42)
        elif t == 4:
            kw = dict(
                emit_dc=False,
                spectral_start=1,
                spectral_end=21,
                restart_interval_blocks=7,
            )
        a = encode_scan(blocks, comp, dc_tabs, ac_tabs, **kw)
        b = native.encode_scan(blocks, comp, dc_tabs, ac_tabs, **kw)
        assert a == b, (trial, t, B)


@pytest.mark.skipif(not native.available(), reason="native packer not built")
def test_native_thread_count_invariance():
    (ldc, lac), (cdc, cac) = default_tables()
    rng = np.random.default_rng(7)
    blocks = (
        rng.integers(-30, 30, size=(5000, 64)) * (rng.random((5000, 64)) < 0.1)
    ).astype(np.int16)
    outs = [
        native.encode_scan(blocks, None, [ldc], [lac], num_threads=n)
        for n in (1, 2, 4)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_restart_marker_cycling():
    (ldc, lac), _ = default_tables()
    blocks = np.zeros((40, 64), dtype=np.int16)
    out = encode_scan(blocks, None, [ldc], [lac], restart_interval_blocks=4)
    # 40 blocks / interval 4 -> 9 RST markers cycling D0..D7, D0.
    for m in range(9):
        assert bytes((0xFF, 0xD0 + (m % 8))) in out
    count = sum(
        out[i] == 0xFF and 0xD0 <= out[i + 1] <= 0xD7
        for i in range(len(out) - 1)
    )
    assert count == 9


def test_progressive_bands():
    assert progressive_bands(4) == [(1, 21), (21, 42), (42, 64)]
    assert progressive_bands(2) == [(1, 64)]
    bands = progressive_bands(64)
    assert bands[0][0] == 1 and bands[-1][1] == 64
    covered = set()
    for s, e in bands:
        covered.update(range(s, e))
    assert covered == set(range(1, 64))


def test_histograms_match_device():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from tpuenc.core.types import EncoderConfig, SamplingFactor, init_components, JpegColorType
    from tpuenc.entropy import device

    rng = np.random.default_rng(5)
    comps = init_components(JpegColorType.YCBCR, SamplingFactor.F_2_2)
    comp_blocks = [
        (
            rng.integers(-80, 80, size=(120, 64)) * (rng.random((120, 64)) < 0.2)
        ).astype(np.int16)
        for _ in comps
    ]
    for scans in (None, 4):
        host = build_histograms(comp_blocks, comps, scans)
        dev = device.scan_histograms(
            [jnp.asarray(b) for b in comp_blocks], comps, scans
        )
        for (hdc, hac), (ddc, dac) in zip(host, dev):
            # Host seeds freq[256]=1; device path adds it later.
            np.testing.assert_array_equal(hdc[:256], np.asarray(ddc)[:256])
            np.testing.assert_array_equal(hac[:256], np.asarray(dac)[:256])


def test_exact_stream_bits():
    """huffopt.exact_stream_bits (the optimized flow's budget sizing,
    VERDICT r4 #4) equals an independent per-symbol bit count over the
    same histograms and tables."""
    from tpuenc.core.types import (
        JpegColorType,
        SamplingFactor,
        init_components,
    )
    from tpuenc.entropy.huffopt import (
        budget_hint_from_bits,
        exact_stream_bits,
        tables_from_histograms,
    )

    rng = np.random.default_rng(12)
    comps = init_components(JpegColorType.YCBCR, SamplingFactor.F_1_1)
    comp_blocks = [
        (
            rng.integers(-90, 90, size=(150, 64)) * (rng.random((150, 64)) < 0.3)
        ).astype(np.int16)
        for _ in comps
    ]
    for scans in (None, 4):
        hists = build_histograms(comp_blocks, comps, scans)
        tables = tables_from_histograms(hists)
        got = exact_stream_bits(hists, tables)

        # Independent count: every histogram entry costs its code size
        # plus its magnitude bits (sym & 15 for AC, s for DC).
        want = 0
        for (dcf, acf), (dct, act) in zip(hists, tables):
            for s in range(17):
                want += int(dcf[s]) * (int(dct.sizes[s]) + s)
            for sym in range(256):
                want += int(acf[sym]) * (int(act.sizes[sym]) + (sym & 15))
        assert got == want
        assert budget_hint_from_bits(got, 450) >= 1

    assert budget_hint_from_bits(0, 0) == 0
    assert budget_hint_from_bits(32 * 100, 100) == 2  # ceil(1.05)


def test_histograms_match_device_high_scan_counts():
    """scans >= 34 includes the empty band [1, 1) (encoder.rs:926-936):
    all three histogram implementations must give it zero mass — no
    symbols and no EOB (writer.rs:364-384)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from tpuenc.core.types import (
        JpegColorType,
        SamplingFactor,
        init_components,
    )
    from tpuenc.entropy import device
    from tpuenc.entropy.pallas_hist import ac_histogram_pallas

    rng = np.random.default_rng(34)
    comps = init_components(JpegColorType.YCBCR, SamplingFactor.F_1_1)
    comp_blocks = [
        (
            rng.integers(-80, 80, size=(96, 64)) * (rng.random((96, 64)) < 0.3)
        ).astype(np.int16)
        for _ in comps
    ]
    for scans in (34, 64):
        host = build_histograms(comp_blocks, comps, scans)
        for pallas in (False, True):
            dev = device.scan_histograms(
                [jnp.asarray(b.T) for b in comp_blocks], comps, scans,
                cm=True, pallas=pallas,
            )
            for (hdc, hac), (ddc, dac) in zip(host, dev):
                np.testing.assert_array_equal(hdc[:256], np.asarray(ddc)[:256])
                np.testing.assert_array_equal(hac[:256], np.asarray(dac)[:256])
    # The empty band alone contributes nothing on the pallas path.
    empty = ac_histogram_pallas(
        jnp.asarray(comp_blocks[0].T), 1, 1, interpret=True
    )
    assert int(np.asarray(empty).sum()) == 0


def test_realign_single_segment_parallel_parity():
    """The in-segment parallel realign (entropy.cpp
    realign_single_parallel, taken for 1 emitted segment >= 1 MiB and
    num_threads > 1) must be byte-identical to the serial path across
    bit offsets, tail remainders, and stuffing density."""
    import numpy as np

    from tpuenc.entropy import native

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(42)
    nbytes = (1 << 20) + 4097
    data = rng.integers(0, 256, nbytes + 16, dtype=np.uint8)
    data[rng.random(data.shape) < 0.03] = 0xFF
    data = data.tobytes()
    for skip_bits in (0, 3, 11):
        for tail in (0, 1, 7):
            nbits = nbytes * 8 - 64 - tail
            ser = native.realign_segments(data, [nbits], num_threads=1,
                                          bit_offset=skip_bits)
            par = native.realign_segments(data, [nbits], num_threads=4,
                                          bit_offset=skip_bits)
            assert ser == par
            oracle = native.realign_segments_py(data, [nbits],
                                                bit_offset=skip_bits)
            assert par == oracle
