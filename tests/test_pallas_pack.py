"""Bit-exact parity of the Pallas pack kernel (interpret mode on CPU).

The kernel's contract: a pure bit-concatenation of per-block entropy codes
(DC diff, ZRLs, AC symbols, EOB) with exact per-block bit lengths and NO
byte alignment — alignment/stuffing happen on the host.  Verified here
against a direct serial packer built on the numpy symbolizer
(entropy/symbols.py), which itself is pinned to the reference semantics
(/root/reference/src/writer.rs:331-388) by the byte-level oracle tests.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpuenc.core.tables import default_tables  # noqa: E402
from tpuenc.entropy import symbols  # noqa: E402
from tpuenc.entropy.device_encode import tables_to_arrays  # noqa: E402
from tpuenc.entropy.device_pack import ScanSpec  # noqa: E402
from tpuenc.entropy.pallas_pack import (  # noqa: E402
    merge_blocks_to_stream,
    pack_tables,
    scan_pack_blocks,
)


def _default_tables():
    return [list(t) for t in default_tables()]


def _serial_bits(blocks, spec: ScanSpec, huffman):
    """Per-block (bitstring:int, nbits) via the numpy symbolizer."""
    B = blocks.shape[0]
    pat = len(spec.dc_tab_pattern)
    seg = spec.seg_blocks if spec.seg_blocks > 0 else B

    out = []
    for b in range(B):
        acc = 0
        nbits = 0

        def put(value, size):
            nonlocal acc, nbits
            acc = (acc << size) | (int(value) & ((1 << size) - 1))
            nbits += size

        dct = spec.dc_tab_pattern[b % pat]
        act = spec.ac_tab_pattern[b % pat]
        dc_tab, ac_tab = huffman[dct][0], huffman[act][1]

        if spec.emit_dc:
            delta = spec.dc_prev_delta[b % pat]
            prev = 0
            if (b % seg) >= delta:
                prev = int(blocks[b - delta, 0])
            diff = int(blocks[b, 0]) - prev
            size, extra = symbols.get_code(np.array([diff]))
            size, extra = int(size[0]), int(extra[0])
            put(dc_tab.codes[size], int(dc_tab.sizes[size]))
            put(extra, size)

        if spec.emit_ac:
            info = symbols.ac_symbols(
                blocks[b : b + 1], spec.spectral_start, spec.spectral_end
            )
            L = spec.spectral_end - spec.spectral_start
            for i in range(L):
                if not info["nz"][0, i]:
                    continue
                for _ in range(int(info["zrl"][0, i])):
                    put(ac_tab.codes[0xF0], int(ac_tab.sizes[0xF0]))
                sym = int(info["sym"][0, i])
                put(ac_tab.codes[sym], int(ac_tab.sizes[sym]))
                put(int(info["extra"][0, i]), int(info["size"][0, i]))
            if info["eob"][0]:
                put(ac_tab.codes[0x00], int(ac_tab.sizes[0x00]))

        out.append((acc, nbits))
    return out


def _expected_stream(per_block):
    acc = 0
    nbits = 0
    for v, n in per_block:
        acc = (acc << n) | v
        nbits += n
    return acc, nbits


def _random_blocks(B, rng, density=0.2, amp=400):
    blocks = np.zeros((B, 64), np.int16)
    mask = rng.random((B, 64)) < density
    vals = rng.integers(-amp, amp, (B, 64))
    blocks[mask] = vals[mask].astype(np.int16)
    return blocks


def _run_kernel(blocks, spec, huffman, budget=None, tile=64):
    dc_p, ac_p = pack_tables(tables_to_arrays(huffman))
    ladder = (budget,) if budget else (16, 48, 224)
    for b in ladder:
        words, lens, ovf = scan_pack_blocks(
            jnp.asarray(blocks), spec, dc_p, ac_p, b,
            tile=tile, interpret=True,
        )
        if bool(ovf):
            continue
        stream, total_bits, ovf2 = merge_blocks_to_stream(words, lens, b)
        if bool(ovf2):
            continue
        return (
            np.asarray(words),
            np.asarray(lens),
            np.asarray(stream),
            int(total_bits),
        )
    raise AssertionError("budget ladder exhausted")


def _stream_to_int(words, nbits):
    if nbits == 0:
        return 0
    acc = 0
    for w in words[: (nbits + 31) // 32]:
        acc = (acc << 32) | int(w)
    return acc >> ((-nbits) % 32)


SPECS = {
    "interleaved_444": ScanSpec(1, 64, True, True, (0, 1, 1), (0, 1, 1),
                                (3, 3, 1), 0),
    "interleaved_seg": ScanSpec(1, 64, True, True, (0, 1, 1), (0, 1, 1),
                                (3, 3, 1), 9),
    "luma_seq": ScanSpec(1, 64, True, True, (0,), (0,), (1,), 0),
    "luma_seq_seg": ScanSpec(1, 64, True, True, (0,), (0,), (1,), 5),
    "prog_dc": ScanSpec(1, 1, True, False, (1,), (1,), (1,), 0),
    "prog_ac_band": ScanSpec(6, 22, False, True, (0,), (0,), (1,), 0),
    "prog_ac_tail": ScanSpec(43, 64, False, True, (1,), (1,), (1,), 7),
    "subsampled_420": ScanSpec(1, 64, True, True, (0, 0, 0, 0, 1, 1),
                               (0, 0, 0, 0, 1, 1), (1, 1, 1, 1, 6, 6), 12),
}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_kernel_matches_serial(name):
    spec = SPECS[name]
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    B = 100 if len(spec.dc_tab_pattern) < 6 else 102  # multiple of pattern
    blocks = _random_blocks(B, rng)
    huffman = _default_tables()

    words, lens, stream, total_bits = _run_kernel(blocks, spec, huffman)
    per_block = _serial_bits(blocks, spec, huffman)

    assert lens[:B].tolist() == [n for _, n in per_block]
    assert lens[B:].sum() == 0
    exp_acc, exp_bits = _expected_stream(per_block)
    assert total_bits == exp_bits
    assert _stream_to_int(stream, total_bits) == exp_acc


@pytest.mark.slow
def test_kernel_sparse_and_dense_extremes():
    spec = SPECS["interleaved_444"]
    huffman = _default_tables()
    rng = np.random.default_rng(7)
    for density, amp in ((0.0, 1), (0.02, 1000), (0.9, 30), (1.0, 1023)):
        blocks = _random_blocks(66, rng, density=density, amp=amp)
        budget = 16 if density < 0.5 else 64  # ladder escalation analog
        words, lens, stream, total_bits = _run_kernel(
            blocks, spec, huffman, budget=budget
        )
        per_block = _serial_bits(blocks, spec, huffman)
        exp_acc, exp_bits = _expected_stream(per_block)
        assert total_bits == exp_bits, density
        assert _stream_to_int(stream, total_bits) == exp_acc, density


@pytest.mark.slow
def test_kernel_long_zero_runs():
    """Runs of 16..62 zeros exercise 1..3 ZRL codes per item."""
    spec = SPECS["luma_seq"]
    huffman = _default_tables()
    blocks = np.zeros((8, 64), np.int16)
    blocks[0, 0] = 5
    blocks[0, 63] = -1          # run 62 -> 3 ZRLs
    blocks[1, 20] = 3
    blocks[1, 40] = -7          # run 19 -> 1 ZRL
    blocks[2, 1] = 1
    blocks[2, 18] = 2           # run 16 -> 1 ZRL
    blocks[3, 35] = 9           # leading run 34 -> 2 ZRLs
    blocks[4, 63] = 32767 // 4
    words, lens, stream, total_bits = _run_kernel(blocks, spec, huffman)
    per_block = _serial_bits(blocks, spec, huffman)
    assert lens[:8].tolist() == [n for _, n in per_block]
    exp_acc, exp_bits = _expected_stream(per_block)
    assert _stream_to_int(stream, total_bits) == exp_acc


def test_kernel_optimized_tables():
    """Optimized (K.2) tables have different code lengths; parity must hold
    for arbitrary tables passed as arrays."""
    from tpuenc.core.tables import optimized_huffman_table

    rng = np.random.default_rng(11)
    blocks = _random_blocks(80, rng, density=0.15)
    freq = np.zeros(257, np.int64)
    freq[:256] = rng.integers(0, 1000, 256)
    freq[256] = 1
    opt = optimized_huffman_table(freq)
    huffman = [(opt, opt), (opt, opt)]
    spec = SPECS["luma_seq_seg"]
    words, lens, stream, total_bits = _run_kernel(blocks, spec, huffman)
    per_block = _serial_bits(blocks, spec, huffman)
    exp_acc, exp_bits = _expected_stream(per_block)
    assert total_bits == exp_bits
    assert _stream_to_int(stream, total_bits) == exp_acc


def test_device_scan_pack_full_pipeline():
    """P1+P2+P4 full-device pipeline matches the XLA-tree reference and the
    serial packer (small substream/chunk sizes keep interpret mode fast)."""
    from tpuenc.entropy.pallas_pack import device_scan_pack

    spec = SPECS["interleaved_seg"]
    huffman = _default_tables()
    rng = np.random.default_rng(42)
    blocks = _random_blocks(123, rng, density=0.25)
    dc_p, ac_p = pack_tables(tables_to_arrays(huffman))

    stream, total_bits, lens, ovf = device_scan_pack(
        jnp.asarray(blocks), spec, dc_p, ac_p, 48,
        tile=32, n_sub=16, chunk=8, interpret=True,
    )
    assert not bool(ovf)
    per_block = _serial_bits(blocks, spec, huffman)
    exp_acc, exp_bits = _expected_stream(per_block)
    assert int(total_bits) == exp_bits
    assert np.asarray(lens)[:123].tolist() == [n for _, n in per_block]
    assert _stream_to_int(np.asarray(stream), int(total_bits)) == exp_acc


def test_device_scan_pack_rung14_dense_parity():
    """Byte parity at the production-default dense-content rung 14
    (BUDGET_LADDER's q100 rung, device_encode.py): dense high-amplitude
    blocks sized to need more than rung 8 but fit 14, full P1-P4 pipeline
    vs the serial oracle (ADVICE r4 — the rung had no committed parity
    coverage)."""
    from tpuenc.entropy.pallas_pack import device_scan_pack

    spec = SPECS["interleaved_seg"]
    huffman = _default_tables()
    rng = np.random.default_rng(140)
    # q100-like density: ~11 words/block — overflows rung 8, fits 14.
    blocks = _random_blocks(200, rng, density=0.5, amp=60)
    dc_p, ac_p = pack_tables(tables_to_arrays(huffman))

    stream, total_bits, lens, ovf = device_scan_pack(
        jnp.asarray(blocks), spec, dc_p, ac_p, 14,
        tile=32, n_sub=16, chunk=8, interpret=True,
    )
    assert not bool(ovf)
    per_block = _serial_bits(blocks, spec, huffman)
    exp_acc, exp_bits = _expected_stream(per_block)
    assert int(total_bits) == exp_bits
    assert np.asarray(lens)[:200].tolist() == [n for _, n in per_block]
    assert _stream_to_int(np.asarray(stream), int(total_bits)) == exp_acc


def test_fold_plan_vmem_adaptive():
    """P3 tile sizing: full tile when small, shrinks as caps grow, and
    None (skip P3) when even one substream per step blows VMEM."""
    from tpuenc.entropy.pallas_pack import fold_plan

    s, caps = fold_plan(8, 256, 16, 512)
    assert s == 16 and caps[-1] >= 256
    s, _ = fold_plan(16, 4096, 16, 8192)
    assert s < 16
    assert fold_plan(8, 131200, 128, 131072) is None


def test_device_scan_pack_multi_chunk_rows():
    """Enough blocks that each substream holds several chunks (n2 > 1,
    non-pow2), exercising the P3 row-fold pass between P2 and P4."""
    from tpuenc.entropy.pallas_pack import device_scan_pack

    spec = SPECS["interleaved_seg"]
    huffman = _default_tables()
    rng = np.random.default_rng(7)
    blocks = _random_blocks(600, rng, density=0.2)
    dc_p, ac_p = pack_tables(tables_to_arrays(huffman))

    stream, total_bits, lens, ovf = device_scan_pack(
        jnp.asarray(blocks), spec, dc_p, ac_p, 48,
        tile=32, n_sub=16, chunk=8, interpret=True,
    )
    assert not bool(ovf)
    per_block = _serial_bits(blocks, spec, huffman)
    exp_acc, exp_bits = _expected_stream(per_block)
    assert int(total_bits) == exp_bits
    assert np.asarray(lens)[:600].tolist() == [n for _, n in per_block]
    assert _stream_to_int(np.asarray(stream), int(total_bits)) == exp_acc


def test_acbands_high_budget_filler_shapes():
    """Regression: at budget >= 48 the 8-slot direct merge's cap exceeds
    the items' static reach, leaving output words that are never written;
    the zero filler must follow the band's chunk-row count (N < 8 for
    real progressive bands), not a hard-coded 8 (round-4 review)."""
    import numpy as np

    from tpuenc.core.tables import default_tables
    from tpuenc.entropy import device_encode as de
    from tpuenc.entropy.device_pack import ScanSpec
    from tpuenc.entropy.pallas_pack import (
        pack_tables,
        scan_pack_blocks_acbands,
    )

    rng = np.random.default_rng(41)
    B = 300
    blocks = rng.integers(-60, 60, (64, B)).astype(np.int16)
    blocks[0] = 0  # DC untouched by AC bands anyway
    huffman = [list(p) for p in default_tables()]
    dc_p, ac_p = pack_tables(de.tables_to_arrays(huffman))
    specs = [
        ScanSpec(1, 21, False, True, (0,), (0,), (1,), 0),
        ScanSpec(21, 42, False, True, (0,), (0,), (1,), 0),
        ScanSpec(42, 64, False, True, (0,), (0,), (1,), 0),
    ]
    outs = {}
    for budget in (14, 16, 48, 224):
        res, ovf = scan_pack_blocks_acbands(
            blocks, specs, ac_p, budget, interpret=True, cm=True
        )
        assert not bool(np.asarray(ovf))
        outs[budget] = res
    for b in (14, 48, 224):
        for (w16, l16), (wb, lb) in zip(outs[16], outs[b]):
            l16 = np.asarray(l16)
            np.testing.assert_array_equal(l16, np.asarray(lb))
            w16 = np.asarray(w16)
            wb = np.asarray(wb)
            nw = (l16 + 31) >> 5
            for blk in range(B):
                n = int(nw[blk])
                np.testing.assert_array_equal(
                    w16[blk, :n], wb[blk, :n], err_msg=f"block {blk}"
                )
