"""Pallas TPU kernel: per-block entropy bit packing, VMEM-resident.

Round-2 replacement for the hot half of ``device_pack.scan_pack``.  The
reference's serial bit-writer (``/root/reference/src/writer.rs:331-388``)
maps to three stages here:

1. **Symbolize + Huffman lookup** (this kernel, ``(TILE, 64)`` layout):
   magnitude categories via float-exponent extraction, zero runs via
   log-shift running maxima, and Huffman (size, code) lookups as
   ``tpu.dynamic_gather`` ops — single-vreg 64-lane table gathers, which
   replace the 128-step select chain that dominated round 1 (~40 ms/3.6 MP
   -> ~0.1 ms).
2. **In-block merge tree** (this kernel, ``(N, C, TILE)`` layout): the six
   pairwise merge levels that fold 64 variable-length items into one
   bitstring per block run entirely in VMEM.  Pairing is done on the
   leading array axis (free in Mosaic), the word-granular barrel shift on
   the sublane axis, with all ``TILE`` blocks riding the lane axis at full
   density.
3. **Cross-block merge** (XLA, ``device_pack.merge_level``): per-block
   streams are already compact (<=19 words), so the remaining log2(B)
   levels are cheap bandwidth-bound elementwise passes.

Unlike round 1, restart segments are **not** byte-aligned on device: the
kernel emits a pure bit-concatenation of per-block codes (DC diff, ZRLs,
AC symbols, EOB) and returns exact per-block bit lengths.  The host's
native ``tpuenc_realign_segments`` shifts each restart segment to a byte
boundary, 1-pads it (writer.rs:138-145) and 0xFF-stuffs in one pass —
which generalizes the device path to arbitrary restart intervals, batched
images and sharded stripes.

DC differentials (with per-segment predictor resets, encoder.rs:748-757)
are precomputed in XLA by :func:`dc_diffs_for_spec` so tiles need no
cross-tile communication.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .device_pack import ScanSpec, merge_level

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Elementwise helpers (shift amounts may be 0..32; uint32-safe like
# device_pack._shr/_shl but local so the kernel has no module-level jax
# tracing surprises).
# ---------------------------------------------------------------------------

# NOTE: shift amounts stay int32 (Mosaic has no unsigned min/max); only the
# shifted values are uint32.

def _clamp31(n):
    n = n.astype(jnp.int32)
    return jnp.clip(n, 0, 31).astype(U32)


def _mask(nbits):
    n = nbits.astype(jnp.int32)
    full = jnp.left_shift(jnp.uint32(1), _clamp31(n)) - jnp.uint32(1)
    return jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF), full)


def _shr(x, n):
    n = n.astype(jnp.int32)
    return jnp.where(n >= 32, jnp.uint32(0), jnp.right_shift(x, _clamp31(n)))


def _shl(x, n):
    n = n.astype(jnp.int32)
    return jnp.where(n >= 32, jnp.uint32(0), jnp.left_shift(x, _clamp31(n)))


def _bit_length(av):
    """Magnitude category of a non-negative int32 array via the float32
    exponent (exact for values < 2^24; JPEG magnitudes are <= 2^15)."""
    f = av.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    size = (bits >> 23) - 126  # exponent + 1
    return jnp.where(av == 0, 0, size)


def _gather_row(row, idx):
    """Per-element lookup of a <=128-entry table held in one lane vreg.

    ``row``: (1, 128) int32 table values; ``idx``: (H, T) int32 in
    [0, 128) with T a multiple of 128.  Each 128-lane column chunk of
    ``idx`` is one same-shape lane-axis ``tpu.dynamic_gather`` whose
    source spans a single vreg along the gather axis (Mosaic rejects
    multi-vreg gather sources).  Gathers run at >=8 sublanes: jax lowers
    the single-row take_along_axis to a gather form Mosaic's
    equal-shapes pattern match rejects, so a (1, T) lookup is broadcast
    to one full vreg and sliced back."""
    H, T = idx.shape
    Hg = max(H, 8)
    op = jnp.broadcast_to(row.astype(jnp.int32), (Hg, 128))
    idxg = idx if H == Hg else jnp.broadcast_to(idx, (Hg, T))
    outs = [
        jnp.take_along_axis(op, idxg[:, c:c + 128], axis=1)
        for c in range(0, T, 128)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out if H == Hg else out[:H]


def _select_by_table(tab_col, per_table_vals):
    """Select between per-table arrays/scalars by a (TILE, 1) table-id
    column.  ``per_table_vals`` is a list indexed by table id."""
    out = per_table_vals[-1]
    for t in range(len(per_table_vals) - 2, -1, -1):
        out = jnp.where(tab_col == t, per_table_vals[t], out)
    return out


def _merge_ncT(lens, words, cap_out):
    """One merge level in the (N, C, TILE) layout.

    ``lens``: (N, 1, T) int32; ``words``: (N, C, T) uint32 MSB-aligned.
    Returns ((N//2, 1, T), (N//2, cap_out, T), overflow).  Pairing uses the
    leading axis (free in Mosaic); the word-offset barrel shift runs on the
    sublane axis C.
    """
    N, C, T = words.shape
    w4 = words.reshape(N // 2, 2, C, T)
    a = w4[:, 0]
    b = w4[:, 1]
    l4 = lens.reshape(N // 2, 2, 1, T)
    la = l4[:, 0]
    lb = l4[:, 1]
    out_len = la + lb

    pad = ((0, 0), (0, cap_out - C), (0, 0))
    a_ext = jnp.pad(a, pad)
    b_ext = jnp.pad(b, pad)

    # Shift amounts are provably in [0, 31] here (bit_off = la & 31, and
    # the lo-shift is masked at bit_off == 0), so the generic >=32 guards
    # of _shr/_shl are dead weight — plain shifts save ~1/3 of the whole
    # P1 kernel (measured).
    bit_off = la & 31
    word_off = la >> 5

    bo = jnp.broadcast_to((la & 31).astype(U32), b_ext.shape)
    hi = jnp.right_shift(b_ext, bo)
    prev = jnp.concatenate(
        [jnp.zeros_like(b_ext[:, :1]), b_ext[:, :-1]], axis=1
    )
    inv = jnp.broadcast_to(((32 - la) & 31).astype(U32), prev.shape)
    lo = jnp.left_shift(prev, inv)
    lo = jnp.where(bit_off == 0, jnp.uint32(0), lo)
    bb = hi | lo

    # word_off = la >> 5 <= C (a's capacity is C words), so the barrel
    # shift only needs to cover powers up to C, not cap_out ~= 2C —
    # drops the widest (full-array) iteration per level.  Post-overflow
    # lengths can exceed this bound, but overflowed results are
    # discarded by budget escalation anyway.
    k = 1
    while k <= C:
        mask = (word_off & k) != 0
        if k >= cap_out:  # full shift-out (zero-size slices don't lower)
            shifted = jnp.zeros_like(bb)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros_like(bb[:, :k]), bb[:, :-k]], axis=1
            )
        bb = jnp.where(jnp.broadcast_to(mask, bb.shape), shifted, bb)
        k <<= 1

    merged = a_ext | bb
    overflow = jnp.any(out_len > 32 * cap_out)
    return out_len, merged, overflow


# Hard bound on one slot item's bit length: a Huffman code is <= 16 bits
# (Annex K.2 length-limited) and magnitude bits are <= 11 (DC) / 10 (AC),
# so every slot register is a single word of <= 27 bits.  The direct
# 8-slot merge below derives its static scatter reach from this.
ITEM_MAX_BITS = 27


def _default_tile(interpret: bool) -> int:
    """512-lane tiles are ~9% faster than 256 on real TPU; under
    interpret mode (CPU test suite) every padded lane is emulated, so a
    small tile floors the cost of small test images."""
    return 128 if interpret else 512



def _merge_slots8_direct(lens, w, cap_out: int):
    """Fused merge levels 1-3: fold the 64 single-word slot items of every
    block directly into 8 chunks of ``cap_out`` words, in the dense 2-D
    ``(64, T)`` layout.

    The generic ``_merge_ncT`` levels operate on ``(N, C, T)`` slabs whose
    sublane axis C is 1-4 words at the early levels — 2-8x vreg padding on
    Mosaic's (8, 128) tiling.  Here item i of chunk n sits at row
    ``8n + i`` of the dense (64, T) arrays; the ``(8, 8, T)`` view makes
    the per-chunk item extraction a single-sublane slice, offsets are a
    7-add prefix sum, and each item scatters its (hi, lo) word pair into
    the statically-reachable output words only (item i starts at bit
    offset <= 27*i, so its hi word index is <= 27*i/32 — most (item, word)
    pairs are statically impossible and cost nothing).

    Returns ``(chunk_lens (N, 1, T), chunk_words (N, cap_out, T),
    overflow)`` with ``N = rows/8`` — the exact shapes the next generic
    tree level expects.  Clipping semantics match the generic levels: an
    item clipped by ``cap_out`` implies the chunk's total exceeds
    ``32 * cap_out``, which the overflow flag reports.

    Two stages: adjacent slot PAIRS merge first with a plain funnel
    (items are < 32 bits, so no word-offset selects at all — the pair is
    a 2-word register of <= 54 bits), then only FOUR pair-items scatter
    into the chunk words — roughly half the statically-reachable
    (item, word) select terms of an 8-item scatter (measured ~25% off
    the whole P1 kernel).
    """
    N = lens.shape[0] // 8
    T = lens.shape[1]

    # Stage 1: adjacent pairs, dense (rows/2, T).
    l2 = lens.reshape(-1, 2, T)
    w2 = w.reshape(-1, 2, T)
    le = l2[:, 0]
    lo_ = l2[:, 1]
    we = w2[:, 0]
    wo = w2[:, 1]
    lp = le + lo_  # <= 54 bits
    phe = jnp.broadcast_to((le & 31).astype(U32), wo.shape)
    inve = jnp.broadcast_to(((32 - le) & 31).astype(U32), wo.shape)
    w0p = we | jnp.right_shift(wo, phe)
    w1p = jnp.left_shift(wo, inve)
    w1p = jnp.where(le == 0, jnp.uint32(0), w1p)

    # Stage 2: four 2-word pair-items per chunk, (N, 4, T) views.
    lp3 = lp.reshape(N, 4, T)
    w0p3 = w0p.reshape(N, 4, T)
    w1p3 = w1p.reshape(N, 4, T)
    il = [lp3[:, i, :] for i in range(4)]
    iw0 = [w0p3[:, i, :] for i in range(4)]
    iw1 = [w1p3[:, i, :] for i in range(4)]

    offs = [jnp.zeros((N, T), jnp.int32)]
    for i in range(1, 4):
        offs.append(offs[-1] + il[i - 1])
    total = offs[3] + il[3]

    PAIR_MAX = 2 * ITEM_MAX_BITS  # 54 bits
    outs = [None] * cap_out
    outs[0] = iw0[0]
    if cap_out > 1:
        outs[1] = iw1[0]
    for i in range(1, 4):
        ph = offs[i] & 31
        woff = offs[i] >> 5
        phu = jnp.broadcast_to(ph.astype(U32), iw0[i].shape)
        inv = jnp.broadcast_to(((32 - ph) & 31).astype(U32), iw0[i].shape)
        nz_ph = ph != 0
        # 2-word item shifted right by ph -> 3 words.
        h0 = jnp.right_shift(iw0[i], phu)
        h1 = jnp.right_shift(iw1[i], phu) | jnp.where(
            nz_ph, jnp.left_shift(iw0[i], inv), jnp.uint32(0)
        )
        h2 = jnp.where(
            nz_ph, jnp.left_shift(iw1[i], inv), jnp.uint32(0)
        )
        womax = min((PAIR_MAX * i) >> 5, cap_out - 1)
        for j, hj in enumerate((h0, h1, h2)):
            for c in range(j, min(womax + j, cap_out - 1) + 1):
                v = jnp.where(woff == c - j, hj, jnp.uint32(0))
                outs[c] = v if outs[c] is None else outs[c] | v
    for c in range(cap_out):
        if outs[c] is None:
            # cap_out can exceed the items' static reach (budget >= 48
            # gives 8-slot chunks a cap of 8): such words are always
            # zero.  Shape follows N (multiband passes N < 8).
            outs[c] = jnp.zeros((N, T), U32)

    chunk_w = jnp.stack(outs, axis=1)          # (N, cap_out, T)
    chunk_len = total.reshape(N, 1, T)
    overflow = jnp.any(total > 32 * cap_out)
    return chunk_len, chunk_w, overflow


def _append_eob(cur_len, cur_w, eob_hs, eob_hc, cap_final: int):
    """Specialized final merge level: append the (<= 16-bit) EOB code to
    the block stream at its known bit offset instead of running a full
    generic ``_merge_ncT`` over (2, cap, T) slabs.

    ``cur_len``: (1, 1, T); ``cur_w``: (1, C, T) with C <= cap_final;
    ``eob_hs``/``eob_hc``: (1, T) size / code (0 where no EOB).  Returns
    ``(out_len (1, 1, T), out_w (1, cap_final, T), overflow)``.
    """
    C = cur_w.shape[1]
    T = cur_w.shape[2]
    la = cur_len[:, 0, :]                       # (1, T)
    tw = _shl(eob_hc, 32 - jnp.minimum(eob_hs, 32))  # MSB-aligned EOB word
    ph = la & 31
    wo = la >> 5
    hi = jnp.right_shift(tw, jnp.broadcast_to(ph.astype(U32), tw.shape))
    inv = jnp.broadcast_to(((32 - ph) & 31).astype(U32), tw.shape)
    lo = jnp.left_shift(tw, inv)
    lo = jnp.where(ph == 0, jnp.uint32(0), lo)

    padded = jnp.pad(cur_w, ((0, 0), (0, cap_final - C), (0, 0)))
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, cap_final, T), 1)
    wo_b = wo.reshape(1, 1, T)
    out = padded | jnp.where(cidx == wo_b, hi.reshape(1, 1, T), jnp.uint32(0))
    out = out | jnp.where(
        cidx == wo_b + 1, lo.reshape(1, 1, T), jnp.uint32(0)
    )
    out_len = la + eob_hs
    overflow = jnp.any(out_len > 32 * cap_final)
    return out_len.reshape(1, 1, T), out, overflow


def block_caps(budget_words: int):
    """Chunk word capacities for the six in-block merge levels plus the
    EOB-append level.

    Items are single-word (<= 32 bits each — ZRL codes live in their own
    slots, see the kernel), so level k's content is bounded by
    ``2^k`` words exactly; the ``min(2c, ...)`` doubling therefore starts
    from c=1 and the early caps are overflow-free by construction."""
    caps = []
    c = 1
    for k in range(1, 7):
        n_slots = 1 << k
        limit = max(5, (budget_words * n_slots + 63) // 64 + 2)
        c = min(2 * c, limit)
        caps.append(c)
    return caps


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _pack_tile_kernel(
    q_ref, dcdiff_ref, dctabs_ref, actabs_ref,
    words_ref, lens_ref,
    *,
    tile: int,
    n_blocks: int,
    spec: ScanSpec,
    budget: int,
):
    """Coefficient-major phase 1: the tile arrives transposed as
    ``(64 slots, T blocks)`` so every elementwise op runs at full lane
    density (T = 256 -> two full vregs per 8 sublanes, vs the half-empty
    64-lane rows of the block-major layout), the run-length prefix scan
    shifts along sublanes, and the item registers are already in the
    ``(N, C, T)`` shape the in-block merge tree wants — no in-kernel
    transposes at all.  Huffman lookups are lane-axis
    ``tpu.dynamic_gather`` ops over 128-entry table rows (a single
    source vreg along the gather axis — the only form Mosaic lowers;
    sublane gathers would need 8 source vregs)."""
    from jax.experimental import pallas as pl

    T = tile
    g = pl.program_id(0)
    bidx = g * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = bidx < n_blocks  # (1, T)

    # int16 coefficient tiles convert to int32 IN the kernel (free on
    # load) instead of materializing a 2x-wide copy of the whole stream
    # in HBM before the pallas_call.
    q = q_ref[:].astype(jnp.int32)  # (64, T), slot-major
    diff = dcdiff_ref[:] if spec.emit_dc else None

    cur_len, cur_w, overflow = _p1_tile_body(
        q, diff, bidx, valid, dctabs_ref, actabs_ref,
        tile=T, spec=spec, budget=budget,
    )

    # cur_len (1, 1, T), cur_w (1, cap_final, T).  Row 0 of the lens slab
    # holds per-block bit lengths; row 1 broadcasts the tile overflow flag
    # (a separate (1,1) output block is not a legal Mosaic block shape).
    words_ref[0] = cur_w[0]
    lens_ref[0, 0] = cur_len[0, 0]
    lens_ref[0, 1] = jnp.broadcast_to(
        overflow.astype(jnp.int32).reshape(1, 1), (1, T)
    )[0]


def _p1_tile_body(
    q, diff, bidx, valid, dctabs_ref, actabs_ref,
    *,
    tile: int,
    spec: ScanSpec,
    budget: int,
):
    """The phase-1 symbolize + in-block merge on one (64, T) quantized
    tile already held in registers: shared between :func:`_pack_tile_kernel`
    (coefficients read from HBM) and the fused sample->pack kernel
    (coefficients produced in-register by the fDCT+quantize prologue).
    Returns ``(cur_len (1, 1, T), cur_w (1, cap_final, T), overflow)``."""
    T = tile
    ss, se = spec.spectral_start, spec.spectral_end
    pat = len(spec.dc_tab_pattern)

    # Static per-block table ids from the repeating pattern (lanes).
    distinct_dc = sorted(set(spec.dc_tab_pattern))
    distinct_ac = sorted(set(spec.ac_tab_pattern))
    if len(distinct_dc) == 1:
        dctab = jnp.full((1, T), distinct_dc[0], jnp.int32)
    else:
        pos = bidx % pat
        dctab = jnp.full((1, T), int(spec.dc_tab_pattern[0]), jnp.int32)
        for p in range(1, pat):
            dctab = jnp.where(pos == p, int(spec.dc_tab_pattern[p]), dctab)
    if len(distinct_ac) == 1:
        actab = jnp.full((1, T), distinct_ac[0], jnp.int32)
    else:
        pos = bidx % pat
        actab = jnp.full((1, T), int(spec.ac_tab_pattern[0]), jnp.int32)
        for p in range(1, pat):
            actab = jnp.where(pos == p, int(spec.ac_tab_pattern[p]), actab)

    # Per-slot item registers, (64 slots, T blocks).  Every item is a
    # SINGLE word: DC <= 16+11 bits, AC symbol+magnitude <= 16+10 bits,
    # and ZRL codes (<= 16 bits) are emitted in their own slots — the
    # k-th ZRL of a zero run occupies the (otherwise empty) zero slot at
    # ``prevnz + 16k``, which precedes the run-ending symbol in slot
    # order, so the slot-order merge tree reproduces the exact reference
    # bitstream (writer.rs:356-388) while the register file and the
    # early merge levels stay one word wide.
    lens = jnp.zeros((64, T), jnp.int32)
    w0 = jnp.zeros((64, T), U32)

    slot = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

    # ----- DC item (slot 0) ------------------------------------------------
    if spec.emit_dc:
        size = _bit_length(jnp.abs(diff))  # diff: (1, T) int32
        extra = (diff - (diff < 0).astype(jnp.int32)).astype(U32) & _mask(size)
        # DC table lookup as a scalar-load select chain: only 16 entries
        # per table (size <= 11 for 8-bit data), so 16 selects per
        # distinct table beat a lane gather — and a gather here needs a
        # (1, T) replicated-sublane index, a layout Mosaic's
        # dynamic_gather lowering rejects (single-table specs fail to
        # compile; the AC gathers below use genuinely sublane-varying
        # (64, T) indices and are fine).
        lut = jnp.zeros((1, T), jnp.int32)
        for t in distinct_dc:
            for s in range(16):
                v = dctabs_ref[0, t * 16 + s]
                hit = (
                    (size == s) if len(distinct_dc) == 1
                    else ((size == s) & (dctab == t))
                )
                lut = jnp.where(hit, v, lut)
        lut = lut.astype(U32)
        hs = (lut >> 16).astype(jnp.int32)
        hc = lut & 0xFFFF
        dc_bits = _shl(hc, size) | extra
        dc_blen = jnp.where(valid, hs + size, 0)
        # DC codes are <= 16+11 bits: the item is a single MSB-placed word.
        dc_w0 = _shl(dc_bits, 32 - dc_blen)
        at0 = slot == 0
        lens = jnp.where(at0, dc_blen, lens)
        w0 = jnp.where(at0, dc_w0, w0)

    # ----- AC items (slots ss..se) -----------------------------------------
    eob_flag = jnp.zeros((1, T), bool)
    if spec.emit_ac:
        in_band = (slot >= ss) & (slot < se)
        band = jnp.where(in_band, q, 0)
        nz = band != 0

        # Running maximum of last-nonzero index via log-shifts (sublanes).
        # (An int8 formulation — 4x lane density for the six shift+max
        # passes — does not lower: Mosaic rejects both the bool-mask
        # relayout into int8 vregs and int8 arith.muli on this backend.)
        lastnz = jnp.where(nz, slot, -1)
        sh = 1
        while sh < 64:
            prev_ln = jnp.concatenate(
                [jnp.full((sh, T), -1, jnp.int32), lastnz[:-sh, :]], axis=0
            )
            lastnz = jnp.maximum(lastnz, prev_ln)
            sh <<= 1
        prevnz = jnp.concatenate(
            [jnp.full((1, T), -1, jnp.int32), lastnz[:-1, :]], axis=0
        )
        # First in-band slot's previous-nonzero is ss-1 (band start).
        prevnz = jnp.maximum(prevnz, ss - 1)
        run = slot - prevnz - 1

        size = _bit_length(jnp.abs(band))
        extra = (band - (band < 0).astype(jnp.int32)).astype(U32) & _mask(size)
        sym = ((run & 15) << 4) | size

        # Huffman lookup: two lane gathers per distinct table over the
        # 256-entry packed row (two 128-lane halves selected by sym>>7,
        # per-block table id selected per lane).
        sym_lo = sym & 127
        hi1 = sym >> 7
        halves = []
        for h in range(2):
            per_t = {
                t: _gather_row(
                    actabs_ref[t:t + 1, h * 128:(h + 1) * 128], sym_lo
                )
                for t in distinct_ac
            }
            if len(distinct_ac) == 1:
                halves.append(per_t[distinct_ac[0]])
            else:
                v = per_t[distinct_ac[-1]]
                for t in distinct_ac[-2::-1]:
                    v = jnp.where(actab == t, per_t[t], v)
                halves.append(v)
        lut = jnp.where(hi1 == 0, halves[0], halves[1]).astype(U32)
        sym_hs = (lut >> 16).astype(jnp.int32)
        sym_hc = lut & 0xFFFF

        # ZRL code: scalar per table id.
        zrl_luts = [actabs_ref[t, 0xF0] for t in range(actabs_ref.shape[0])]
        if len(distinct_ac) == 1:
            zrl_lut = jnp.full((1, T), zrl_luts[distinct_ac[0]], jnp.int32)
        else:
            zrl_lut = _select_by_table(
                actab, [jnp.full((1, T), z, jnp.int32) for z in zrl_luts]
            )
        zrl_lut = jnp.broadcast_to(zrl_lut, (64, T)).astype(U32)
        zrl_hs = (zrl_lut >> 16).astype(jnp.int32)
        zrl_hc = (zrl_lut & 0xFFFF)

        item_active = nz & jnp.broadcast_to(valid, (64, T))
        # ZRL items in their own slots: a zero slot z with
        # run(z) % 16 == 15 (i.e. z is the 16th/32nd/48th zero after the
        # previous nonzero) carries one ZRL code — provided some nonzero
        # follows in the band (otherwise z is in the EOB tail).  The
        # run-ending symbol then needs no ZRL prefix at all.
        last_in_band = jnp.broadcast_to(lastnz[63:64, :], (64, T))
        zrl_here = (
            (band == 0)
            & in_band
            & ((run & 15) == 15)
            & (slot < last_in_band)
            & jnp.broadcast_to(valid, (64, T))
        )

        sym_bits = _shl(sym_hc, size) | extra
        sym_blen = sym_hs + size

        ac_slots = in_band & (slot > 0) if spec.emit_dc else in_band
        ac_len = jnp.where(
            item_active, sym_blen, jnp.where(zrl_here, zrl_hs, 0)
        )
        ac_w0 = jnp.where(
            item_active,
            _shl(sym_bits, 32 - sym_blen),
            jnp.where(zrl_here, _shl(zrl_hc, 32 - zrl_hs), jnp.uint32(0)),
        )
        lens = jnp.where(ac_slots, ac_len, lens)
        w0 = jnp.where(ac_slots, ac_w0, w0)

        eob_flag = (lastnz[63:64, :] < (se - 1)) & valid

    # ----- In-block merge tree ---------------------------------------------
    # Levels 1-3 run as one direct 8-slot scatter merge in the dense
    # (64, T) layout (the generic (N, C, T) slabs pad their 1-4-word
    # sublane axis 2-8x at these levels); levels 4-6 use the generic
    # pairwise merge.
    caps = block_caps(budget)
    cur_len, cur_w, overflow = _merge_slots8_direct(lens, w0, caps[2])
    for cap in caps[3:]:
        cur_len, cur_w, ovf = _merge_ncT(cur_len, cur_w, cap)
        overflow = overflow | ovf

    # ----- EOB append ------------------------------------------------------
    cap_final = caps[-1] + 1
    if spec.emit_ac:
        eob_luts = [actabs_ref[t, 0x00] for t in range(actabs_ref.shape[0])]
        if len(distinct_ac) == 1:
            eob_lut = jnp.full((1, T), eob_luts[distinct_ac[0]], jnp.int32)
        else:
            eob_lut = _select_by_table(
                actab, [jnp.full((1, T), z, jnp.int32) for z in eob_luts]
            )
        eob_lut = eob_lut.astype(U32)
        eob_hs = jnp.where(eob_flag, (eob_lut >> 16).astype(jnp.int32), 0)
        eob_hc = jnp.where(eob_flag, eob_lut & 0xFFFF, jnp.uint32(0))
        cur_len, cur_w, ovf = _append_eob(
            cur_len, cur_w, eob_hs, eob_hc, cap_final
        )
        overflow = overflow | ovf
    else:
        cur_w = jnp.pad(cur_w, ((0, 0), (0, cap_final - caps[-1]), (0, 0)))

    return cur_len, cur_w, overflow


def final_block_cap(budget: int) -> int:
    return block_caps(budget)[-1] + 1


def band_tree_caps(budget: int, ss: int, se: int):
    """Merge-tree plan for one spectral band ``[ss, se)`` packed from
    8-slot direct-merge chunks: returns ``(row0, row1, gen_caps,
    cap_final)`` where rows ``[8*row0, 8*row1)`` of the (64, T) slot
    arrays cover the band, ``gen_caps`` are the generic pairwise levels'
    capacities (band chunk counts padded to a power of two), and
    ``cap_final`` includes the EOB word."""
    row0 = ss // 8
    row1 = -(-se // 8)
    nc = row1 - row0
    ncp = 1 << max(0, (nc - 1).bit_length())
    c = block_caps(budget)[2]  # capacity of one 8-slot chunk
    gen_caps = []
    n_slots = 8
    while ncp > 1:
        n_slots *= 2
        limit = max(5, (budget * n_slots + 63) // 64 + 2)
        c = min(2 * c, limit)
        gen_caps.append(c)
        ncp //= 2
    return row0, row1, gen_caps, c + 1


def _pack_tile_kernel_acbands(
    q_ref, actabs_ref,
    words_ref, lens_ref,
    *,
    tile: int,
    n_blocks: int,
    bands: Tuple[Tuple[int, int], ...],
    ac_tab: int,
    budget: int,
    cap_f: int,
):
    """Multi-band phase 1: pack SEVERAL progressive AC band scans of the
    same component in ONE kernel pass over the coefficient tile.

    The expensive shared work — the tile load, the last-nonzero log-scan,
    magnitude categories — runs once; each band then pays only its own
    run fixup (zero runs reset at the band start: ``prevnz`` clamps to
    ``ss - 1``), its Huffman gathers and a merge tree over just the slot
    rows covering the band.  Replaces the per-scan kernel launches that
    made 4-scan progressive plans pay 9 full P1 passes (VERDICT r3 #2);
    band semantics follow the reference's per-scan writer
    (``/root/reference/src/encoder.rs:929-971``, ``writer.rs:356-388``).

    Outputs: ``words_ref`` (1, n_bands*cap_f, T) — band b's block
    bitstrings at word rows [b*cap_f, (b+1)*cap_f); ``lens_ref``
    (1, 8, T) — row b = band b per-block bit lengths, row 7 = overflow
    flag (so n_bands <= 7).
    """
    from jax.experimental import pallas as pl

    T = tile
    g = pl.program_id(0)
    bidx = g * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = bidx < n_blocks  # (1, T)

    # int16 coefficient tiles convert to int32 IN the kernel (free on
    # load) instead of materializing a 2x-wide copy of the whole stream
    # in HBM before the pallas_call.
    q = q_ref[:].astype(jnp.int32)  # (64, T), slot-major
    slot = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

    ss_min = min(b[0] for b in bands)
    se_max = max(b[1] for b in bands)
    in_any = (slot >= ss_min) & (slot < se_max)
    bandq = jnp.where(in_any, q, 0)
    nz = bandq != 0

    # Global last-nonzero running maximum (shared by every band: band
    # [ss, se)'s last in-band nonzero is ``lastnz[se-1]`` when >= ss).
    lastnz = jnp.where(nz, slot, -1)
    sh = 1
    while sh < 64:
        prev_ln = jnp.concatenate(
            [jnp.full((sh, T), -1, jnp.int32), lastnz[:-sh, :]], axis=0
        )
        lastnz = jnp.maximum(lastnz, prev_ln)
        sh <<= 1
    prevnz_g = jnp.concatenate(
        [jnp.full((1, T), -1, jnp.int32), lastnz[:-1, :]], axis=0
    )

    size = _bit_length(jnp.abs(bandq))
    extra = (bandq - (bandq < 0).astype(jnp.int32)).astype(U32) & _mask(size)

    zrl_lut = jnp.full((64, T), actabs_ref[ac_tab, 0xF0], jnp.int32).astype(U32)
    zrl_hs = (zrl_lut >> 16).astype(jnp.int32)
    zrl_hc = zrl_lut & 0xFFFF
    eob_lut_s = actabs_ref[ac_tab, 0x00]

    overflow = jnp.zeros((), bool)
    valid64 = jnp.broadcast_to(valid, (64, T))
    for b, (ss, se) in enumerate(bands):
        in_band = (slot >= ss) & (slot < se)
        prevnz = jnp.maximum(prevnz_g, ss - 1)
        run = slot - prevnz - 1
        sym = ((run & 15) << 4) | size
        sym_lo = sym & 127
        hi1 = sym >> 7
        halves = [
            _gather_row(
                actabs_ref[ac_tab:ac_tab + 1, h * 128:(h + 1) * 128], sym_lo
            )
            for h in range(2)
        ]
        lut = jnp.where(hi1 == 0, halves[0], halves[1]).astype(U32)
        sym_hs = (lut >> 16).astype(jnp.int32)
        sym_hc = lut & 0xFFFF
        sym_bits = _shl(sym_hc, size) | extra
        sym_blen = sym_hs + size

        last_in_band = jnp.broadcast_to(lastnz[se - 1:se, :], (64, T))
        zrl_here = (
            (bandq == 0)
            & in_band
            & ((run & 15) == 15)
            & (slot < last_in_band)
            & valid64
        )
        item_active = nz & in_band & valid64
        l_b = jnp.where(
            item_active, sym_blen, jnp.where(zrl_here, zrl_hs, 0)
        )
        w_b = jnp.where(
            item_active,
            _shl(sym_bits, 32 - sym_blen),
            jnp.where(zrl_here, _shl(zrl_hc, 32 - zrl_hs), jnp.uint32(0)),
        )

        row0, row1, gen_caps, cap_band = band_tree_caps(budget, ss, se)
        sub_l = l_b[row0 * 8:row1 * 8]
        sub_w = w_b[row0 * 8:row1 * 8]
        cl, cw, ovf = _merge_slots8_direct(sub_l, sub_w, block_caps(budget)[2])
        overflow = overflow | ovf
        nc = row1 - row0
        ncp = 1 << max(0, (nc - 1).bit_length())
        if ncp != nc:
            cl = jnp.pad(cl, ((0, ncp - nc), (0, 0), (0, 0)))
            cw = jnp.pad(cw, ((0, ncp - nc), (0, 0), (0, 0)))
        for cap in gen_caps:
            cl, cw, ovf = _merge_ncT(cl, cw, cap)
            overflow = overflow | ovf

        eob_flag = (lastnz[se - 1:se, :] < (se - 1)) & valid
        eob_lut = jnp.full((1, T), eob_lut_s, jnp.int32).astype(U32)
        eob_hs = jnp.where(eob_flag, (eob_lut >> 16).astype(jnp.int32), 0)
        eob_hc = jnp.where(eob_flag, eob_lut & 0xFFFF, jnp.uint32(0))
        cl, cw, ovf = _append_eob(cl, cw, eob_hs, eob_hc, cap_band)
        overflow = overflow | ovf

        out_w = cw[0]
        if cap_band < cap_f:
            out_w = jnp.pad(out_w, ((0, cap_f - cap_band), (0, 0)))
        words_ref[0, b * cap_f:(b + 1) * cap_f] = out_w
        lens_ref[0, b] = cl[0, 0]

    for b in range(len(bands), 7):
        lens_ref[0, b] = jnp.zeros((1, T), jnp.int32)[0]
    lens_ref[0, 7] = jnp.broadcast_to(
        overflow.astype(jnp.int32).reshape(1, 1), (1, T)
    )[0]


@lru_cache(maxsize=128)
def _build_pack_acbands_fn(
    tile: int,
    n_blocks: int,
    n_tiles: int,
    bands: Tuple[Tuple[int, int], ...],
    ac_tab: int,
    budget: int,
    n_actabs: int,
    interpret: bool,
):
    """jit(q_cm (64, Bp), ac_packed) -> ([(words (Bp, capF), lens (Bp,))
    per band], overflow)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cap_f = max(band_tree_caps(budget, ss, se)[3] for ss, se in bands)
    nb = len(bands)
    assert nb <= 7
    kern = partial(
        _pack_tile_kernel_acbands,
        tile=tile, n_blocks=n_blocks, bands=bands, ac_tab=ac_tab,
        budget=budget, cap_f=cap_f,
    )
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((64, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_actabs, 256), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nb * cap_f, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, nb * cap_f, tile), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(q_cm, ac_packed):
        words_t, lens_t = call(q_cm, ac_packed)
        outs = []
        for b in range(nb):
            wb = words_t[:, b * cap_f:(b + 1) * cap_f, :]
            words = jnp.swapaxes(wb, 1, 2).reshape(n_tiles * tile, cap_f)
            lens = lens_t[:, b, :].reshape(n_tiles * tile)
            outs.append((words, lens))
        overflow = jnp.any(lens_t[:, 7, :] != 0)
        return outs, overflow

    return jax.jit(fn)


def scan_pack_blocks_acbands(
    blocks,
    specs,
    ac_packed,
    budget: int,
    *,
    tile: int | None = None,
    interpret: bool = False,
    cm: bool = False,
):
    """Pack several AC-only band scans of one component in one kernel
    launch.  ``specs`` are AC-only ScanSpecs sharing a single ac table;
    returns ``([(words (Bp, capF), lens (Bp,)) per spec], overflow)``.
    """
    assert all(
        s.emit_ac and not s.emit_dc and len(s.ac_tab_pattern) == 1
        for s in specs
    )
    tabs = {s.ac_tab_pattern[0] for s in specs}
    assert len(tabs) == 1
    if tile is None:
        tile = _default_tile(interpret)
    B = blocks.shape[1] if cm else blocks.shape[0]
    n_tiles = -(-B // tile)
    Bp = n_tiles * tile
    # Empty bands (band [1, 1) for scans >= 34, encoder.rs:926-936) emit
    # nothing per block — not even EOB (writer.rs:364-384).  Keep them out
    # of the kernel (a zero-width band has no slot rows) and synthesize
    # zero outputs in plan order.
    live = [i for i, s in enumerate(specs)
            if s.spectral_start < s.spectral_end]
    if len(live) < len(specs):
        zero = (jnp.zeros((Bp, 1), U32), jnp.zeros((Bp,), jnp.int32))
        if not live:
            return [zero for _ in specs], jnp.asarray(False)
        outs_live, ovf = scan_pack_blocks_acbands(
            blocks, [specs[i] for i in live], ac_packed, budget,
            tile=tile, interpret=interpret, cm=cm,
        )
        by_idx = dict(zip(live, outs_live))
        return [by_idx.get(i, zero) for i in range(len(specs))], ovf
    q = blocks if cm else blocks.T
    if Bp != B:
        q = jnp.pad(q, ((0, 0), (0, Bp - B)))
    bands = tuple((s.spectral_start, s.spectral_end) for s in specs)
    fn = _build_pack_acbands_fn(
        # Block-level caps: clamp like scan_pack_blocks.
        tile, B, n_tiles, bands, specs[0].ac_tab_pattern[0],
        max(budget, 16), int(ac_packed.shape[0]), interpret,
    )
    return fn(q, ac_packed)


@lru_cache(maxsize=128)
def _build_pack_blocks_fn(
    tile: int,
    n_blocks: int,
    n_tiles: int,
    spec: ScanSpec,
    budget: int,
    n_actabs: int,
    interpret: bool,
    cm: bool = False,
):
    """jit(q_padded, dcdiff, dc_packed, ac_packed) ->
    (words (Bp, capB) u32, lens (Bp,) i32, overflow bool)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    capB = final_block_cap(budget)
    kern = partial(
        _pack_tile_kernel,
        tile=tile, n_blocks=n_blocks, spec=spec, budget=budget,
    )

    grid = (n_tiles,)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # q and dcdiff arrive coefficient-major: (64, Bp) and (1, Bp).
            pl.BlockSpec((64, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_actabs, 256), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, capB, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, capB, tile), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(q_padded, dcdiff, dc_packed, ac_packed):
        q_cm = q_padded if cm else q_padded.T
        words_t, lens_t = call(
            q_cm, dcdiff.reshape(1, -1), dc_packed, ac_packed,
        )
        # (G, capB, T) -> (G*T, capB); lens slab row 0 -> (G*T,), row 1 ->
        # per-tile overflow flags.
        words = jnp.swapaxes(words_t, 1, 2).reshape(n_tiles * tile, capB)
        lens = lens_t[:, 0, :].reshape(n_tiles * tile)
        overflow = jnp.any(lens_t[:, 1, :] != 0)
        return words, lens, overflow

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# XLA-side orchestration: DC diffs, kernel, cross-block tree.
# ---------------------------------------------------------------------------

def dc_diffs_for_spec(blocks, spec: ScanSpec, prev_tail=None,
                      global_offset=None):
    """(B,) int32 DC differentials with same-component predecessors and
    per-segment predictor resets (reference encoder.rs:748-757).

    Mid-stream form (chunked / striped packing): ``prev_tail`` holds the
    DC values of the ``len(dc_tab_pattern)`` blocks immediately before
    this chunk in the global stream, and ``global_offset`` (traced
    scalar, a multiple of the pattern length) is the chunk's first global
    block index, fixing restart geometry and predictor resets."""
    return dc_diffs_from_dc(
        blocks[:, 0], spec, prev_tail=prev_tail, global_offset=global_offset
    )


def dc_diffs_from_dc(dc, spec: ScanSpec, prev_tail=None, global_offset=None):
    """Same as :func:`dc_diffs_for_spec` but from the (B,) DC coefficient
    row directly (coefficient-major callers pass ``stream_cm[0]``)."""
    B = dc.shape[0]
    dc = dc.astype(jnp.int32)
    pat = len(spec.dc_tab_pattern)
    bidx = jnp.arange(B, dtype=jnp.int32)
    pos_in_pat = bidx % pat
    delta = jnp.full((B,), int(spec.dc_prev_delta[0]), jnp.int32)
    for p in range(1, pat):
        delta = jnp.where(pos_in_pat == p, int(spec.dc_prev_delta[p]), delta)

    if prev_tail is None:
        prev = jnp.zeros((B,), jnp.int32)
        for d in sorted(set(spec.dc_prev_delta)):
            rolled = jnp.roll(dc, d)
            prev = jnp.where(delta == d, rolled, prev)
        seg = spec.seg_blocks if spec.seg_blocks > 0 else B
        in_seg = (bidx % seg) >= delta
        prev = jnp.where(in_seg, prev, 0)
        return dc - prev

    # Mid-stream: predecessors may live in the previous chunk's tail.
    ext = jnp.concatenate([prev_tail.astype(jnp.int32), dc])
    prev = jnp.zeros((B,), jnp.int32)
    for d in sorted(set(spec.dc_prev_delta)):
        prev = jnp.where(delta == d, jax.lax.dynamic_slice_in_dim(
            ext, pat - d, B
        ), prev)
    gidx = bidx + global_offset
    if spec.seg_blocks > 0:
        in_seg = (gidx % spec.seg_blocks) >= delta
    else:
        in_seg = gidx >= delta
    prev = jnp.where(in_seg, prev, 0)
    return dc - prev


def pack_tables(huffman_arrays):
    """(dc_sizes, dc_codes, ac_sizes, ac_codes) (T,256) u32 arrays ->
    (dc_packed (1,128) i32 [tab*16+size, zero-padded lane vreg],
    ac_packed (T,256) i32)."""
    dc_sizes, dc_codes, ac_sizes, ac_codes = huffman_arrays
    T = dc_sizes.shape[0]
    dc_sizes = np.asarray(dc_sizes)
    dc_codes = np.asarray(dc_codes)
    dc_packed = np.zeros((1, 128), np.int32)
    for t in range(min(T, 4)):
        dc_packed[0, t * 16:(t + 1) * 16] = (
            (dc_sizes[t, :16].astype(np.int64) << 16)
            | dc_codes[t, :16].astype(np.int64)
        ).astype(np.int32)
    ac_packed = (
        (np.asarray(ac_sizes).astype(np.int64) << 16)
        | np.asarray(ac_codes).astype(np.int64)
    ).astype(np.int32)
    return jnp.asarray(dc_packed), jnp.asarray(ac_packed)


def scan_pack_blocks(
    blocks,
    spec: ScanSpec,
    dc_packed,
    ac_packed,
    budget: int,
    *,
    tile: int | None = None,
    interpret: bool = False,
    dcdiff=None,
    cm: bool = False,
):
    """Pack one scan: (B, 64) int blocks -> per-block bitstrings + lens.

    Returns (words (Bp, capB) u32, lens (Bp,) i32, overflow).  Bp is B
    rounded up to the tile size; padding blocks have len 0.  ``dcdiff``
    overrides the internally-computed DC differentials (mid-stream
    chunk/stripe packing, see :func:`dc_diffs_for_spec`).  With
    ``cm=True`` the blocks arrive coefficient-major as (64, B) — the
    kernel's native layout — and no transpose is emitted at all.
    """
    if tile is None:
        tile = _default_tile(interpret)
    B = blocks.shape[1] if cm else blocks.shape[0]
    n_tiles = -(-B // tile)
    Bp = n_tiles * tile
    if spec.emit_ac and not spec.emit_dc and \
            spec.spectral_start >= spec.spectral_end:
        # Empty spectral band — the reference's band math
        # (encoder.rs:926-936) yields band [1, 1) for scans >= 34 and
        # write_ac_block over an empty range emits nothing, not even EOB
        # (writer.rs:364-384): every block is 0 bits.
        return (
            jnp.zeros((Bp, 1), U32),
            jnp.zeros((Bp,), jnp.int32),
            jnp.asarray(False),
        )
    # Keep the input dtype (int16 streams stay int16 in HBM; the kernel
    # widens on load); only the tiny DC row needs int32 here.
    q = blocks
    if dcdiff is None:
        if spec.emit_dc:
            dc_row = q[0] if cm else q[:, 0]
            dcdiff = dc_diffs_from_dc(dc_row, spec)
        else:
            dcdiff = jnp.zeros((B,), jnp.int32)
    else:
        dcdiff = dcdiff.astype(jnp.int32)
    if Bp != B:
        q = jnp.pad(q, ((0, 0), (0, Bp - B)) if cm else ((0, Bp - B), (0, 0)))
        dcdiff = jnp.pad(dcdiff, (0, Bp - B))

    fn = _build_pack_blocks_fn(
        # Block-level caps must hold the busiest single block regardless
        # of how small the aggregate budget is (see BUDGET_LADDER note).
        tile, B, n_tiles, spec, max(budget, 16), int(ac_packed.shape[0]),
        interpret, cm,
    )
    return fn(q, dcdiff[:, None], dc_packed, ac_packed)


# ---------------------------------------------------------------------------
# P2: substream chunk-merge kernel.  The scan's blocks are partitioned into
# S=128 contiguous substreams (lanes); each grid step folds N2 consecutive
# chunks of every substream with the same leading-dim merge tree as the
# in-block phase.  Everything stays in VMEM; output chunks are fat
# (~N2*budget words) so the remaining work is tiny.
# ---------------------------------------------------------------------------

def chunk_caps(cap_in: int, n_chunks: int, budget: int):
    """Capacity schedule for merging ``n_chunks`` single-block chunks of
    ``cap_in`` words (continues the cross-block schedule of the XLA tree)."""
    caps = []
    c = cap_in
    blocks = 1
    n = n_chunks
    while n > 1:
        blocks *= 2
        # Absolute burst slack, saturating at 256 words: small
        # aggregation windows are high-variance (a pair of busy blocks
        # easily exceeds a small relative budget), while the large late
        # levels — whose caps dominate the P2-P4 barrel/DMA cost — stay
        # within ~budget*blocks (measured window maxima in
        # device_encode.BUDGET_LADDER's note).
        c = min(2 * c, budget * blocks + 16 * min(blocks, 16))
        caps.append(c)
        n //= 2
    return caps


def _merge_chunks_kernel(lens_ref, words_ref, out_words_ref, out_lens_ref,
                         *, caps):
    cur_len = lens_ref[:]              # (N2, 1, S) int32
    cur_w = words_ref[:].astype(U32)   # (N2, C_in, S)
    overflow = jnp.zeros((), bool)
    for cap in caps:
        cur_len, cur_w, ovf = _merge_ncT(cur_len, cur_w, cap)
        overflow = overflow | ovf
    out_words_ref[0] = cur_w[0]
    out_lens_ref[0, 0] = cur_len[0, 0]
    S = cur_len.shape[-1]
    out_lens_ref[0, 1] = jnp.broadcast_to(
        overflow.astype(jnp.int32).reshape(1, 1), (1, S)
    )[0]


def fold_caps(cap_in: int, n_chunks: int, budget_eff: int):
    """Capacity schedule for the P3 row fold: like :func:`chunk_caps`
    but every cap is rounded up to a multiple of 128 so the folded rows
    are legal Mosaic lane dimensions (and P4 DMA groups)."""
    caps = []
    c = cap_in
    blocks = 1
    n = n_chunks
    while n > 1:
        blocks *= 2
        c = min(2 * c, budget_eff * blocks + 256)
        c = -(-c // 128) * 128
        caps.append(c)
        n //= 2
    return caps


def fold_plan(n2p: int, capP: int, n_sub: int, budget_eff: int,
              vmem_budget: int = 6 << 20):
    """Pick the P3 substream tile so the kernel's VMEM working set fits
    (input block + output block + ~4 live arrays per merge level).
    Returns ``(s_tile, caps)`` or ``None`` when even ``s_tile=1`` would
    blow VMEM — the caller then skips P3 and lets P4 loop over all
    chunk rows."""
    caps = fold_caps(capP, n2p, budget_eff)

    def est(s):
        b = 4 * s * n2p * capP + 4 * s * caps[-1]
        rows = n2p
        for c in caps:
            rows //= 2
            b += 16 * s * rows * c
        return b

    s = min(16, n_sub)
    while s >= 1:
        if n_sub % s == 0 and est(s) <= vmem_budget:
            return s, caps
        s //= 2
    return None


def _merge_nsc(lens, words, cap_out: int):
    """One pairwise merge level in (N rows, S substreams, C words-on-lanes)
    layout: pairing reshapes the LEADING axis (free in Mosaic) and the
    word-granular barrel shift runs along lanes."""
    N, S, C = words.shape
    w4 = words.reshape(N // 2, 2, S, C)
    a = w4[:, 0]
    b = w4[:, 1]
    l4 = lens.reshape(N // 2, 2, S)
    la = l4[:, 0]
    lb = l4[:, 1]
    out_len = la + lb

    pad = ((0, 0), (0, 0), (0, cap_out - C))
    a_ext = jnp.pad(a, pad)
    b_ext = jnp.pad(b, pad)

    # Guard-free shifts: amounts in [0, 31] by construction (see
    # _merge_ncT).
    bit_off = (la & 31)[..., None]
    word_off = (la >> 5)[..., None]

    hi = jnp.right_shift(
        b_ext, jnp.broadcast_to(bit_off.astype(U32), b_ext.shape)
    )
    prev = jnp.concatenate(
        [jnp.zeros_like(b_ext[..., :1]), b_ext[..., :-1]], axis=-1
    )
    inv = jnp.broadcast_to(
        (((32 - la) & 31)[..., None]).astype(U32), prev.shape
    )
    lo = jnp.left_shift(prev, inv)
    lo = jnp.where(bit_off == 0, jnp.uint32(0), lo)
    bb = hi | lo

    # Same bound as _merge_ncT: word_off <= C (see comment there).
    k = 1
    while k <= C:
        mask = (word_off & k) != 0
        if k >= cap_out:
            shifted = jnp.zeros_like(bb)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros_like(bb[..., :k]), bb[..., :-k]], axis=-1
            )
        bb = jnp.where(jnp.broadcast_to(mask, bb.shape), shifted, bb)
        k <<= 1

    merged = a_ext | bb
    overflow = jnp.any(out_len > 32 * cap_out)
    return out_len, merged, overflow


def _fold_rows_kernel(lens_ref, words_ref, out_w_ref, out_l_ref, *, caps):
    """Fold one substream-tile's chunk-rows into single rows, entirely in
    VMEM.  Block layout (1, N, s_tile, C): rows pair on the leading axis,
    substreams ride sublanes, words ride lanes."""
    cur_len = lens_ref[0]                 # (N, s_tile) int32
    cur_w = words_ref[0].astype(U32)      # (N, s_tile, C)
    overflow = jnp.zeros((), bool)
    for cap in caps:
        cur_len, cur_w, ovf = _merge_nsc(cur_len, cur_w, cap)
        overflow = overflow | ovf
    out_w_ref[0] = cur_w[0]               # (s_tile, capF)
    S = cur_len.shape[1]
    l8 = jnp.concatenate(
        [
            cur_len[0][:, None],
            jnp.broadcast_to(
                overflow.astype(jnp.int32).reshape(1, 1), (S, 1)
            ),
            jnp.zeros((S, 6), jnp.int32),
        ],
        axis=1,
    )
    out_l_ref[0] = l8


@lru_cache(maxsize=128)
def _build_fold_rows_fn(n2p: int, capP: int, capF: int, n_sub: int,
                        s_tile: int, budget_eff: int, interpret: bool):
    """P3: fold each substream's ``n2p`` chunk-rows into ONE row, so the
    serial P4 concat loop runs over ``n_sub`` rows instead of
    ``n_sub * n2``.  Grid tiles the substream axis in groups of
    ``s_tile`` (sized by :func:`fold_plan` to fit VMEM); inputs arrive
    pre-arranged as (G, n2p, s_tile, capP) so every block's trailing two
    dims equal the array dims (Mosaic-legal for any s_tile).
    ``budget_eff`` is the per-chunk word budget (chunk blocks *
    budget)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    caps = fold_caps(capP, n2p, budget_eff)
    assert caps[-1] == capF
    assert n_sub % s_tile == 0
    G = n_sub // s_tile
    kern = partial(_fold_rows_kernel, caps=caps)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, n2p, s_tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2p, s_tile, capP), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s_tile, capF), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 8), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, s_tile, capF), jnp.uint32),
            jax.ShapeDtypeStruct((G, s_tile, 8), jnp.int32),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=128)
def _build_merge_chunks_fn(n1p: int, n2: int, cap_in: int, cap_out: int,
                           n_sub: int, budget: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N2 = n1p // n2
    caps = chunk_caps(cap_in, N2, budget)
    assert caps[-1] == cap_out
    kern = partial(_merge_chunks_kernel, caps=caps)
    call = pl.pallas_call(
        kern,
        grid=(n2,),
        in_specs=[
            pl.BlockSpec((N2, 1, n_sub), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, cap_in, n_sub), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap_out, n_sub), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_sub), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n2, cap_out, n_sub), jnp.uint32),
            jax.ShapeDtypeStruct((n2, 8, n_sub), jnp.int32),
        ],
        interpret=interpret,
    )
    return call


# ---------------------------------------------------------------------------
# P4: row concatenation kernel.  Rows (one per merged substream chunk, in
# stream order) are appended into the final bitstream at precomputed bit
# offsets: shift by the offset phase, OR the carry word from the previous
# row into word 0, and DMA the row to its word offset in the HBM output.
# Adjacent rows share one boundary 128-word group whose final content is
# produced by the LATER row (the carry OR includes the earlier row's
# bits), so DMAs must LAND in row order — but they need not serialize
# against compute: the staging buffer is double-buffered and row i's DMA
# is waited only just before row i+1's DMA starts, so the barrel-shift
# compute of row i+1 overlaps the DMA of row i (ROADMAP r4 "pipelined
# P4 DMAs"; measured P4 0.26 -> 0.16 ms on the flagship stream).
# ---------------------------------------------------------------------------

def _concat_rows_kernel(pos_ref, bits_ref, rows_ref, out_ref,
                        staging0_ref, staging1_ref, carry_ref, sem,
                        *, rows_per_step: int, W: int, STG: int,
                        n_steps: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    stagings = (staging0_ref, staging1_ref)

    @pl.when(g == 0)
    def _():
        carry_ref[:, :] = jnp.zeros((1, 128), U32)

    def _dma_for(r, slot: int):
        """The (re)constructible async-copy descriptor of global row
        ``r``'s store from the STATIC staging slot ``slot`` (start and
        wait must describe the same transfer; a dynamic sublane slice of
        one (2, STG) buffer is not a legal Mosaic memref slice)."""
        base = (pos_ref[r] >> 5) & (-128)
        return pltpu.make_async_copy(
            stagings[slot],
            out_ref.at[:, pl.ds(pl.multiple_of(base, 128), STG)],
            sem.at[slot],
        )

    def _one_row(i, r, slot: int):
        pos = pos_ref[r]
        nbits = bits_ref[r]
        # DMA starts must be provably 128-aligned: write the whole 128-word
        # group containing the bit offset, with the row barrel-shifted to
        # its in-group position and the previous group's content OR-carried.
        woff = pos >> 5
        base = woff & (-128)
        d = woff - base          # in-group word offset, [0, 128)
        phase = pos & 31

        # phase in [0, 31]: guard-free shifts (see _merge_ncT).
        inv = jnp.uint32((32 - phase) & 31)
        rv = rows_ref[pl.ds(i, 1), :].astype(U32)          # (1, W)
        hi = jnp.right_shift(rv, jnp.full((1, W), phase.astype(U32)))
        prev = jnp.concatenate(
            [jnp.zeros((1, 1), U32), rv[:, :-1]], axis=1
        )
        lo = jnp.left_shift(prev, jnp.full((1, W), inv))
        lo = jnp.where(phase == 0, jnp.uint32(0), lo)
        sh = hi | lo
        tail = jnp.left_shift(rv[:, W - 1:W], jnp.full((1, 1), inv))
        tail = jnp.where(phase == 0, jnp.uint32(0), tail)
        stage = jnp.concatenate(
            [sh, tail, jnp.zeros((1, STG - W - 1), U32)], axis=1
        )
        # Static 7-step lane barrel: shift right by d words.
        for j in range(7):
            k = 1 << j
            shifted = jnp.concatenate(
                [jnp.zeros((1, k), U32), stage[:, :-k]], axis=1
            )
            stage = jnp.where((d & k) != 0, shifted, stage)
        stage = stage | jnp.pad(carry_ref[:, :], ((0, 0), (0, STG - 128)))
        stagings[slot][:, :] = stage

        # Next carry group: the (possibly partial) 128-word group holding
        # the new stream end, extracted with a left barrel by whole groups.
        pos2 = pos + nbits
        base2 = (pos2 >> 5) & (-128)
        dgrp = (base2 - base) >> 7
        ext = stage
        for j in range((STG // 128 - 1).bit_length()):
            k = 1 << j
            shifted = jnp.concatenate(
                [ext[:, k * 128:], jnp.zeros((1, k * 128), U32)], axis=1
            )
            ext = jnp.where((dgrp & k) != 0, shifted, ext)
        carry_ref[:, :] = ext[:, :128]

        # Land row r-1's DMA before starting row r's (write order on the
        # shared boundary group), then fire this row's — the NEXT row's
        # barrel shifts overlap it.
        @pl.when(r > 0)
        def _wait_prev():
            _dma_for(r - 1, 1 - slot).wait()

        _dma_for(r, slot).start()

    def body(p, _):
        # Two rows per iteration so the staging-slot parity is STATIC
        # (rows_per_step is even and each step starts on an even row).
        for s in (0, 1):
            i = p * 2 + s
            _one_row(i, g * rows_per_step + i, s)
        return 0

    jax.lax.fori_loop(0, rows_per_step // 2, body, 0)

    @pl.when(g == n_steps - 1)
    def _drain():
        r_last = n_steps * rows_per_step - 1
        _dma_for(r_last, r_last & 1).wait()


@lru_cache(maxsize=128)
def _build_concat_rows_fn(R: int, W: int, capW: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_per_step = 8
    assert R % rows_per_step == 0
    STG = -(-(128 + W + 1) // 128) * 128
    kern = partial(_concat_rows_kernel, rows_per_step=rows_per_step,
                   W=W, STG=STG, n_steps=R // rows_per_step)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R // rows_per_step,),
        in_specs=[
            pl.BlockSpec((rows_per_step, W), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, STG), jnp.uint32),
            pltpu.VMEM((1, STG), jnp.uint32),
            pltpu.VMEM((1, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, capW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def _dc_only_pack_blocks(blocks, spec: ScanSpec, dc_packed, tile: int,
                         dcdiff=None, cm: bool = False):
    """P1 fast path for DC-only scans (progressive DC passes,
    ``encoder.rs`` first scans): one item per block, <= 27 bits, so the
    64-slot Mosaic kernel and its in-block merge tree are pure overhead
    — the per-block (word, len) pair is a handful of fused XLA ops over
    the precomputed DC differentials (measured 0.43 -> ~0.03 ms for the
    56k-block luma DC scan).  Byte-identical to the kernel path
    (tests/test_pack_v2.py progressive cases, golden fixtures)."""
    B = blocks.shape[1] if cm else blocks.shape[0]
    Bp = -(-B // tile) * tile
    if dcdiff is None:
        dc_row = (blocks[0] if cm else blocks[:, 0]).astype(jnp.int32)
        dcdiff = dc_diffs_from_dc(dc_row, spec)
    diff = dcdiff.astype(jnp.int32).reshape(-1)[:B]
    size = _bit_length(jnp.abs(diff))
    pat = spec.dc_tab_pattern
    if len(set(pat)) == 1:
        idx = size + 16 * int(pat[0])
    else:
        pos = jnp.arange(B, dtype=jnp.int32) % len(pat)
        tabv = jnp.full((B,), int(pat[0]), jnp.int32)
        for p in range(1, len(pat)):
            tabv = jnp.where(pos == p, int(pat[p]), tabv)
        idx = size + 16 * tabv
    lut = dc_packed[0, idx].astype(U32)
    hs = (lut >> 16).astype(jnp.int32)
    hc = lut & 0xFFFF
    extra = (diff - (diff < 0).astype(jnp.int32)).astype(U32) & _mask(size)
    blen = hs + size  # <= 16 + 11: always a single MSB-placed word
    word = _shl(_shl(hc, size) | extra, 32 - blen)
    if Bp != B:
        word = jnp.pad(word, (0, Bp - B))
        blen = jnp.pad(blen, (0, Bp - B))
    return word[:, None], blen, jnp.asarray(False)


def device_scan_pack(
    blocks,
    spec: ScanSpec,
    dc_packed,
    ac_packed,
    budget: int,
    *,
    tile: int | None = None,
    n_sub: int = 128,
    chunk: int = 256,
    interpret: bool = False,
    dcdiff=None,
    valid_blocks=None,
    cm: bool = False,
):
    """Full device pack: (B, 64) blocks -> (stream_words, total_bits,
    block_bits (B,), overflow), entirely in three Pallas stages.
    ``cm=True`` takes coefficient-major (64, B) blocks (see
    :func:`scan_pack_blocks`).

    The stream is a raw bit concatenation of per-block codes (no segment
    alignment); callers derive per-segment bit lengths from ``block_bits``
    and finish on the host with ``native.realign_segments``.

    Mid-stream form: ``dcdiff`` supplies externally-computed DC
    differentials; ``valid_blocks`` (traced scalar) masks a trailing run
    of alignment-padding blocks so they contribute no bits (used by the
    striped path whose last stripe carries padding MCU rows).
    """
    if tile is None:
        tile = _default_tile(interpret)
    B = blocks.shape[1] if cm else blocks.shape[0]
    if spec.emit_dc and not spec.emit_ac:
        words, lens, ovf1 = _dc_only_pack_blocks(
            blocks, spec, dc_packed, tile, dcdiff=dcdiff, cm=cm
        )
    else:
        words, lens, ovf1 = scan_pack_blocks(
            blocks, spec, dc_packed, ac_packed, budget,
            tile=tile, interpret=interpret, dcdiff=dcdiff, cm=cm,
        )
    if valid_blocks is not None:
        Bp = words.shape[0]
        valid = jnp.arange(Bp, dtype=jnp.int32) < valid_blocks
        lens = jnp.where(valid, lens, 0)
        words = jnp.where(valid[:, None], words, jnp.uint32(0))
    stream, total_bits, ovf2 = merge_pack_stream(
        words, lens, budget, n_sub=n_sub, chunk=chunk, interpret=interpret
    )
    return stream, total_bits, lens, ovf1 | ovf2


def merge_pack_stream(
    words,
    lens,
    budget: int,
    *,
    n_sub: int = 128,
    chunk: int = 256,
    interpret: bool = False,
):
    """P2-P4: per-block MSB-aligned bitstrings (Bp, capB) + (Bp,) lens ->
    one raw bit-concatenated stream.  Shared by single-scan packs
    (:func:`device_scan_pack`) and the multi-scan fused plan
    (``device_encode._pack_scans_v2``), which concatenates every scan's
    phase-1 output and pays these three kernel launches ONCE instead of
    once per scan — the per-program floor (~0.2-0.5 ms) dominated the
    12-scan progressive pack.  Returns (stream_words, total_bits, ovf).
    """
    Bp, capB = words.shape

    n1 = -(-Bp // n_sub)
    # Small scans: shrink the chunk so the stream isn't padded to
    # n_sub*chunk (= 32768) block slots — pure overhead for images with
    # few blocks (and catastrophic under interpret mode, where every
    # padded slot is emulated).  chunk stays a power of two >= 2 so the
    # halving cap schedules hold.
    chunk = max(2, min(chunk, 1 << max(1, (n1 - 1).bit_length())))
    n1p = -(-n1 // chunk) * chunk
    total = n_sub * n1p
    if total != Bp:
        words = jnp.pad(words, ((0, total - Bp), (0, 0)))
        lens_p = jnp.pad(lens, (0, total - Bp))
    else:
        lens_p = lens

    X = jnp.transpose(words.reshape(n_sub, n1p, capB), (1, 2, 0))
    L = jnp.transpose(lens_p.reshape(n_sub, n1p, 1), (1, 2, 0))

    n2 = n1p // chunk
    caps = chunk_caps(capB, chunk, budget)
    cap_out = caps[-1]
    p2 = _build_merge_chunks_fn(
        n1p, n2, capB, cap_out, n_sub, budget, interpret
    )
    out_w, out_l = p2(L, X)
    ovf2 = jnp.any(out_l[:, 1, :] != 0)

    plan = None
    if n2 > 1:
        n2p = 1 << (n2 - 1).bit_length()
        capP = -(-cap_out // 128) * 128
        budget_eff = budget * chunk
        plan = fold_plan(n2p, capP, n_sub, budget_eff)
    if plan is not None:
        # P3: fold each substream's chunk-rows into one row (zero-length
        # pow2 padding rows merge as no-ops), cutting P4's serial loop
        # from n_sub*n2 to n_sub iterations.  Skipped (plan is None) when
        # even a one-substream tile would blow the VMEM budget — P4 then
        # loops over all chunk rows, slower but correct.
        s_tile, caps_f = plan
        capF = caps_f[-1]
        G = n_sub // s_tile
        # (n2, cap, S) -> (G, n2p, s_tile, capP): substream tiles lead,
        # rows pair on axis 1, words ride lanes.
        w3 = jnp.transpose(out_w, (2, 0, 1))        # (S, n2, cap)
        w3 = jnp.pad(w3, ((0, 0), (0, n2p - n2), (0, capP - cap_out)))
        w3 = jnp.transpose(
            w3.reshape(G, s_tile, n2p, capP), (0, 2, 1, 3)
        )
        l3 = jnp.transpose(out_l[:, 0, :], (1, 0))  # (S, n2)
        l3 = jnp.pad(l3, ((0, 0), (0, n2p - n2)))
        l3 = jnp.transpose(l3.reshape(G, s_tile, n2p), (0, 2, 1))
        p3 = _build_fold_rows_fn(
            n2p, capP, capF, n_sub, s_tile, budget_eff, interpret
        )
        rows, l8 = p3(l3, w3)           # (G, s_tile, capF), (G, s_tile, 8)
        rows = rows.reshape(n_sub, capF)
        l8 = l8.reshape(n_sub, 8)
        ovf2 = ovf2 | jnp.any(l8[:, 1] != 0)
        row_bits = l8[:, 0]
        cap_out = capF
        n2 = 1
    else:
        rows = jnp.transpose(out_w, (2, 0, 1)).reshape(n_sub * n2, cap_out)
        row_bits = jnp.transpose(out_l[:, 0, :], (1, 0)).reshape(n_sub * n2)
    pos = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_bits)[:-1]]
    ).astype(jnp.int32)

    R = n_sub * n2
    capW = -(-(R * cap_out + cap_out + 256) // 128) * 128
    p4 = _build_concat_rows_fn(R, cap_out, capW, interpret)
    stream2d = p4(pos, row_bits.astype(jnp.int32), rows)
    total_bits = pos[-1] + row_bits[-1]
    return stream2d[0], total_bits, ovf2


def merge_blocks_to_stream(words, lens, budget: int, capW: int | None = None):
    """Cross-block XLA merge tree: (Bp, capB) u32 + (Bp,) lens -> one
    MSB-aligned stream (total words clipped by the budget schedule).

    Returns (stream_words, total_bits, overflow).
    """
    Bp, capB = words.shape
    n_pad = 1 << max(1, (Bp - 1).bit_length())
    if n_pad != Bp:
        words = jnp.pad(words, ((0, n_pad - Bp), (0, 0)))
        lens = jnp.pad(lens, (0, n_pad - Bp))

    cap = capB
    level_blocks = 1
    overflow = jnp.zeros((), bool)
    while n_pad > 1:
        level_blocks *= 2
        cap = min(2 * cap, budget * level_blocks + 16 * min(level_blocks, 16))
        if capW is not None:
            cap = min(cap, capW)
        lens, words, ovf = merge_level(lens[None], words[None], cap)
        lens, words = lens[0], words[0]
        overflow = overflow | ovf
        n_pad //= 2
    return words[0], lens[0], overflow


# ---------------------------------------------------------------------------
# Fused sample -> packed-bitstring kernel (interleaved single-scan modes).
#
# One Mosaic pass runs fDCT + zigzag + reciprocal quantize (the
# ``kernels.pallas_fdct`` prologue), the mid-stream DC differential (the
# cross-tile boundary DCs ride a VMEM scratch carried across sequential
# grid steps), and the full P1 symbolize + in-block merge — the (64, L)
# int16 coefficient stream never exists in HBM and the separate P1
# launch and XLA dcdiff pass disappear (flagship coefficients+P1 were
# two kernels with a 2x21.6 MB HBM round trip between them).
# Reference semantics: fdct.rs:107-238, quantization.rs:291-307,
# encoder.rs:748-788, writer.rs:308-470.
# ---------------------------------------------------------------------------

def _fused_sample_pack_kernel(
    x_ref, recip_ref, corr_ref, dctabs_ref, actabs_ref,
    words_ref, lens_ref, carry_ref,
    *,
    tile: int,
    n_blocks: int,
    spec: ScanSpec,
    budget: int,
    qtab_pattern: Tuple[int, ...],
):
    from jax.experimental import pallas as pl

    from ..core.tables import QUANT_SHIFT, ZIGZAG
    from ..kernels.pallas_fdct import _butterfly

    T = tile
    pat = len(spec.dc_tab_pattern)
    g = pl.program_id(0)
    bidx = g * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = bidx < n_blocks  # (1, T)

    @pl.when(g == 0)
    def _init():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    # ----- fDCT + zigzag + quantize (pallas_fdct._kernel inlined) -----
    x = x_ref[:].astype(jnp.int32)  # (64, T) level-shifted samples
    rows = [x[k, :] for k in range(64)]
    mid = [None] * 64
    for y in range(8):
        group = _butterfly([rows[y * 8 + xx] for xx in range(8)], True)
        for xx in range(8):
            mid[y * 8 + xx] = group[xx]
    final = [None] * 64
    for xx in range(8):
        group = _butterfly([mid[y * 8 + xx] for y in range(8)], False)
        for y in range(8):
            final[y * 8 + xx] = group[y]

    # Per-lane quantization table from the MCU pattern (luma/chroma).
    distinct_q = sorted(set(qtab_pattern))
    if len(distinct_q) == 1:
        is_t1 = jnp.full((1, T), distinct_q[0] == 1, bool)
    else:
        pos = bidx % pat
        is_t1 = jnp.full((1, T), qtab_pattern[0] == 1, bool)
        for p in range(1, pat):
            if qtab_pattern[p] == 1:
                is_t1 = is_t1 | (pos == p)
            else:
                is_t1 = is_t1 & (pos != p)

    q_rows = []
    for j in range(64):
        v = final[int(ZIGZAG[j])].reshape(1, T)
        r = jnp.where(is_t1, recip_ref[j, 1], recip_ref[j, 0])
        c = jnp.where(is_t1, corr_ref[j, 1], corr_ref[j, 0])
        absv = jnp.abs(v)
        qv = ((absv + c) * r) >> QUANT_SHIFT
        q_rows.append(jnp.where(v < 0, -qv, qv))
    q = jnp.concatenate(q_rows, axis=0)  # (64, T) quantized zigzag

    # ----- Mid-stream DC differentials (dc_diffs_from_dc semantics) ---
    diff = None
    if spec.emit_dc:
        dc = q[0:1]  # (1, T)
        carry = carry_ref[:]  # (1, 128): lanes 128-pat.. hold prev DCs
        ext = jnp.concatenate([carry[:, 128 - pat:], dc], axis=1)
        pos = bidx % pat
        delta = jnp.full((1, T), int(spec.dc_prev_delta[0]), jnp.int32)
        for p in range(1, pat):
            delta = jnp.where(pos == p, int(spec.dc_prev_delta[p]), delta)
        prev = jnp.zeros((1, T), jnp.int32)
        for d in sorted(set(spec.dc_prev_delta)):
            prev = jnp.where(delta == d, ext[:, pat - d: pat - d + T], prev)
        if spec.seg_blocks > 0:
            in_seg = (bidx % spec.seg_blocks) >= delta
        else:
            in_seg = bidx >= delta
        prev = jnp.where(in_seg, prev, 0)
        diff = dc - prev
        carry_ref[:] = dc[:, T - 128:]  # next tile's boundary DCs

    cur_len, cur_w, overflow = _p1_tile_body(
        q, diff, bidx, valid, dctabs_ref, actabs_ref,
        tile=T, spec=spec, budget=budget,
    )

    words_ref[0] = cur_w[0]
    lens_ref[0, 0] = cur_len[0, 0]
    lens_ref[0, 1] = jnp.broadcast_to(
        overflow.astype(jnp.int32).reshape(1, 1), (1, T)
    )[0]


@lru_cache(maxsize=64)
def _build_fused_sample_pack_fn(
    tile: int,
    n_blocks: int,
    n_tiles: int,
    spec: ScanSpec,
    budget: int,
    qtab_pattern: Tuple[int, ...],
    n_actabs: int,
    interpret: bool,
):
    """jit(x_cm_padded (64, Bp) int16, recip2 (64, 2), corr2 (64, 2),
    dc_packed, ac_packed) -> (words (Bp, capB) u32, lens (Bp,), ovf)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    capB = final_block_cap(budget)
    kern = partial(
        _fused_sample_pack_kernel,
        tile=tile, n_blocks=n_blocks, spec=spec, budget=budget,
        qtab_pattern=qtab_pattern,
    )
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((64, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 2), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 2), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_actabs, 256), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, capB, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, capB, tile), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        interpret=interpret,
    )

    def fn(x_cm, recip2, corr2, dc_packed, ac_packed):
        words_t, lens_t = call(x_cm, recip2, corr2, dc_packed, ac_packed)
        words = jnp.swapaxes(words_t, 1, 2).reshape(n_tiles * tile, capB)
        lens = lens_t[:, 0, :].reshape(n_tiles * tile)
        overflow = jnp.any(lens_t[:, 1, :] != 0)
        return words, lens, overflow

    return jax.jit(fn)


def fused_sample_pack_blocks(
    x_cm,
    spec: ScanSpec,
    qtab_pattern: Tuple[int, ...],
    recip2,
    corr2,
    dc_packed,
    ac_packed,
    budget: int,
    *,
    tile: int | None = None,
    interpret: bool = False,
):
    """Sample-to-bitstring P1 for one interleaved scan: ``x_cm`` is the
    (64, B) int16 MCU-ordered LEVEL-SHIFTED sample stream (pipeline
    ``raw_fn_cm_samples``); returns ``(words (Bp, capB), lens (Bp,),
    overflow)`` exactly like :func:`scan_pack_blocks`, with the fDCT /
    quantize / DC-diff prologue fused in."""
    if tile is None:
        tile = _default_tile(interpret)
    B = x_cm.shape[1]
    n_tiles = -(-B // tile)
    Bp = n_tiles * tile
    x = x_cm
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B)))
    fn = _build_fused_sample_pack_fn(
        tile, B, n_tiles, spec, max(budget, 16), tuple(qtab_pattern),
        int(ac_packed.shape[0]), interpret,
    )
    return fn(x, recip2, corr2, dc_packed, ac_packed)
