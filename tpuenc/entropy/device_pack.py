"""Device-side entropy bit packing.

The TPU answer to SURVEY §7's "hard part (1)": the reference's serial
bit-writer (``/root/reference/src/writer.rs:331-388``) becomes a
data-parallel **log-tree bitstream reduction** that runs entirely on device,
so only the final compressed bytes ever cross the (slow) host link:

1.  *Symbolize* — every zigzag position of every block becomes one
    variable-length item: the DC slot holds the Huffman-coded DC
    differential, each AC slot holds up to three ZRL codes plus the
    (run<<4|size) symbol and magnitude bits (<= 74 bits, held MSB-aligned in
    a 3-word register), and a per-block tail item carries the EOB code plus
    the 1-bit padding that byte-aligns each restart segment
    (writer.rs:138-145).  All arithmetic is elementwise int32/uint32.
2.  *Reduce* — adjacent bitstring chunks are merged pairwise:
    ``merge(A, B) = A | (B >> len(A))`` over MSB-aligned uint32 word
    arrays, with the variable word-offset handled by a gather and the
    bit-offset by per-lane variable shifts.  6 in-block levels fold the 64
    slots into one block stream; ~log2(B) further levels fold blocks into
    the whole scan.  Chunk capacities follow a budget schedule (clipping
    far below the worst case); any clipped-off bit sets an overflow flag
    and the caller falls back to a fatter budget or the host packer.
3.  *Assemble* — scan streams are converted to bytes and placed into one
    output buffer with dynamic-slice writes at data-dependent byte offsets
    (every restart segment is 1-padded to a byte boundary on device, so
    scan starts are byte-aligned).  The host receives (bytes, lengths),
    then only 0xFF-stuffs and splices RST markers/headers — an O(output)
    pass.

Byte parity: the resulting unstuffed segment bytes are identical to the
reference's serial writer output; verified against the Python oracle in
tests and transitively against libjpeg via decode round-trips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_ONES32 = np.uint32(0xFFFFFFFF)


def _mask(nbits):
    """(1 << nbits) - 1 for nbits in [0, 32], elementwise, uint32-safe."""
    nbits = nbits.astype(U32)
    full = jnp.left_shift(jnp.uint32(1), jnp.minimum(nbits, 31)) - jnp.uint32(1)
    return jnp.where(nbits >= 32, jnp.uint32(_ONES32), full)


def _shr(x, n):
    """x >> n with n in [0, 32]; returns 0 at n == 32 (uint32-safe)."""
    n = n.astype(U32)
    return jnp.where(n >= 32, jnp.uint32(0), jnp.right_shift(x, jnp.minimum(n, 31)))


def _shl(x, n):
    n = n.astype(U32)
    return jnp.where(n >= 32, jnp.uint32(0), jnp.left_shift(x, jnp.minimum(n, 31)))


def bit_length_i32(v):
    """Magnitude category (0 for 0) as int32, elementwise (16 compares)."""
    av = jnp.abs(v.astype(jnp.int32))
    size = jnp.zeros_like(av)
    for k in range(16):
        size = size + (av >= (1 << k)).astype(jnp.int32)
    return size


class Reg96(NamedTuple):
    """An MSB-aligned bitstring of <= 96 bits in 3 uint32 words plus its
    length; all fields share a common batch shape."""

    len: jnp.ndarray  # int32
    w0: jnp.ndarray   # uint32
    w1: jnp.ndarray
    w2: jnp.ndarray


def reg96_empty(shape) -> Reg96:
    z = jnp.zeros(shape, dtype=U32)
    return Reg96(jnp.zeros(shape, dtype=jnp.int32), z, z, z)


def reg96_append(reg: Reg96, bits, blen) -> Reg96:
    """Append ``blen`` (<=32) bits (low-aligned in ``bits``) to the
    register.  blen may be 0 (no-op lanes)."""
    bits = bits.astype(U32) & _mask(blen)
    end = reg.len + blen  # new end position from MSB
    words = []
    for j, w in enumerate((reg.w0, reg.w1, reg.w2)):
        # Right-shift needed to land bits' LSB at global bit end-1 within
        # word j (bits [32j, 32j+32)).
        rs = end - 32 * (j + 1)
        c = jnp.where(
            rs >= 0, _shr(bits, rs), _shl(bits, -rs)
        )
        c = jnp.where(blen > 0, c, jnp.uint32(0))
        words.append(w | c)
    return Reg96(end, *words)


def merge_level(lens, words, cap_out: int):
    """Merge adjacent chunk pairs along axis -2.

    ``lens``: (..., N) int32 bit lengths; ``words``: (..., N, C) uint32
    MSB-aligned bitstrings.  Returns ((..., N//2), (..., N//2, cap_out),
    overflow) where overflow flags any chunk whose merged length exceeds
    32*cap_out.

    TPU note: the variable word-offset shift is a *barrel shifter* —
    ceil(log2(C+1)) conditional static shifts — because per-lane gathers
    (take_along_axis) lower catastrophically on TPU while elementwise
    selects are effectively free.  Pairing is done by an even/odd reshape
    rather than strided slicing for the same reason.
    """
    C = words.shape[-1]
    N = words.shape[-2]
    lead = words.shape[:-2]

    lens2 = lens.reshape(*lead, N // 2, 2)
    a_len = lens2[..., 0]
    b_len = lens2[..., 1]
    w2 = words.reshape(*lead, N // 2, 2, C)
    A = w2[..., 0, :]
    B = w2[..., 1, :]
    out_len = a_len + b_len

    # Pad to output capacity.
    pad = [(0, 0)] * (A.ndim - 1) + [(0, cap_out - C)]
    A_ext = jnp.pad(A, pad)
    B_ext = jnp.pad(B, pad)

    s = a_len[..., None]  # shift B right by len(A) bits
    bit_off = (s & 31).astype(U32)
    word_off = s >> 5

    # Bit-granular shift with carry-in from the previous word.
    hi = _shr(B_ext, jnp.broadcast_to(bit_off, B_ext.shape))
    prev = jnp.concatenate(
        [jnp.zeros_like(B_ext[..., :1]), B_ext[..., :-1]], axis=-1
    )
    lo = _shl(prev, jnp.broadcast_to(32 - bit_off, prev.shape))
    lo = jnp.where(bit_off == 0, jnp.uint32(0), lo)
    B_bits = hi | lo

    # Word-granular barrel shift: word_off <= C (since len(A) <= 32*C).
    k = 1
    while k <= C:
        mask = (word_off & k) != 0
        shifted = jnp.concatenate(
            [jnp.zeros_like(B_bits[..., :k]), B_bits[..., :-k]], axis=-1
        )
        B_bits = jnp.where(mask, shifted, B_bits)
        k <<= 1

    merged = A_ext | B_bits
    overflow = jnp.any(out_len > 32 * cap_out)
    return out_len, merged, overflow


def mxu_lookup(table, idx, n: int):
    """Table lookup as a fused two-level select chain.

    Per-lane gathers lower poorly on TPU.  A one-hot MXU contraction works
    but materializes the one-hot; a 128-step select chain over the low
    index bits (with a tiny where-chain over 128-entry groups for the high
    bits) fuses into a single VPU pass and measures fastest.  ``table``:
    (n,) uint32, n a multiple of 128; ``idx``: int32 array, values in
    [0, n).

    Off-TPU the unrolled chain compiles slowly, so the one-hot matmul is
    used there instead (results identical).
    """
    if jax.default_backend() != "tpu":
        oh = jax.nn.one_hot(idx.reshape(-1), n, dtype=jnp.float32)
        vals = oh @ table.astype(jnp.float32)
        return vals.astype(jnp.int32).reshape(idx.shape)

    groups = n // 128
    t2 = table.reshape(groups, 128).astype(jnp.int32)
    g = idx >> 7
    rel = idx & 127
    acc = jnp.zeros(idx.shape, dtype=jnp.int32)
    for c in range(128):
        val = t2[groups - 1, c]
        for gi in range(groups - 2, -1, -1):
            val = jnp.where(g == gi, t2[gi, c], val)
        acc = acc + jnp.where(rel == c, val, 0)
    return acc


def block_cap_schedule(budget_words: int):
    """Chunk word capacities for the 6 in-block merge levels (2,4,...,64
    slots).  Clipped toward the per-block budget; worst-case-safe at the
    bottom where items are small."""
    caps = []
    c = 3
    for k in range(1, 7):
        n_slots = 1 << k
        limit = max(5, (budget_words * n_slots + 63) // 64 + 2)
        c = min(2 * c, limit)
        caps.append(c)
    return caps


class ScanSpec(NamedTuple):
    """Static description of one scan's entropy coding."""

    spectral_start: int
    spectral_end: int
    emit_dc: bool
    emit_ac: bool
    # Per-block table ids, as a repeating pattern (length = blocks per MCU
    # for interleaved scans, 1 otherwise).
    dc_tab_pattern: Tuple[int, ...]
    ac_tab_pattern: Tuple[int, ...]
    # Distance (in blocks) to the previous block of the same component,
    # per pattern position.
    dc_prev_delta: Tuple[int, ...]
    seg_blocks: int  # restart interval in blocks; 0 = single segment


def scan_pack(
    blocks,
    spec: ScanSpec,
    dc_sizes,
    dc_codes,
    ac_sizes,
    ac_codes,
    budget_words: int,
):
    """Pack one scan into an MSB-aligned uint32 bitstream on device.

    ``blocks``: (B, 64) int16/int32 zigzag quantized coefficients in scan
    order.  ``*_sizes``/``*_codes``: (T, 256) uint32 Huffman lookups.

    Returns (words, total_bits, seg_bits, overflow):
      words    — (capW,) uint32, the scan's unstuffed bitstream, MSB-first;
                 every restart segment is 1-padded to a byte boundary.
      total_bits — int32 scalar (multiple of 8).
      seg_bits — (n_segments,) int32 per-segment bit counts.
      overflow — bool scalar; if set the budget was too small and the
                 result must be discarded.
    """
    B = blocks.shape[0]
    q = blocks.astype(jnp.int32)
    ss, se = spec.spectral_start, spec.spectral_end

    # Pattern-position lookups as where-chains (per-lane gathers are slow
    # on TPU; the pattern is tiny and static).
    pat = len(spec.dc_tab_pattern)
    bidx = jnp.arange(B, dtype=jnp.int32)
    pos_in_pat = bidx % pat

    def pattern_select(pattern):
        out = jnp.full((B,), int(pattern[0]), dtype=jnp.int32)
        for p in range(1, pat):
            out = jnp.where(pos_in_pat == p, int(pattern[p]), out)
        return out

    dc_tab = pattern_select(spec.dc_tab_pattern)
    ac_tab = pattern_select(spec.ac_tab_pattern)

    # Packed (size << 16 | code) tables: one lookup instead of two.
    dc_packed = (dc_sizes.astype(U32) << 16) | dc_codes.astype(U32)
    ac_packed = (ac_sizes.astype(U32) << 16) | ac_codes.astype(U32)

    seg = spec.seg_blocks if spec.seg_blocks > 0 else B
    n_seg = -(-B // seg)

    # ------------------------------------------------------------------
    # Per-slot item lengths and bit patterns.
    # ------------------------------------------------------------------
    slot_lens = jnp.zeros((B, 64), dtype=jnp.int32)
    items = reg96_empty((B, 64))

    if spec.emit_dc:
        dc = q[:, 0]
        # Previous same-component DC via static rolls selected by pattern
        # position (the distinct delta set is tiny).
        delta = pattern_select(spec.dc_prev_delta)
        prev = jnp.zeros((B,), dtype=jnp.int32)
        for d in sorted(set(spec.dc_prev_delta)):
            rolled = jnp.roll(dc, d)
            prev = jnp.where(delta == d, rolled, prev)
        in_seg = (bidx % seg) >= delta
        prev = jnp.where(in_seg, prev, 0)
        diff = dc - prev
        size = bit_length_i32(diff)
        extra = (diff - (diff < 0).astype(jnp.int32)).astype(U32) & _mask(size)
        dc_lut = mxu_lookup(
            dc_packed.reshape(-1), dc_tab * 256 + size,
            dc_packed.size,
        ).astype(U32)
        hs = (dc_lut >> 16).astype(jnp.int32)
        hc = dc_lut & 0xFFFF
        bits = _shl(hc, size) | extra
        blen = hs + size
        dc_reg = reg96_append(reg96_empty((B,)), bits, blen)
        items = Reg96(
            items.len.at[:, 0].set(dc_reg.len),
            items.w0.at[:, 0].set(dc_reg.w0),
            items.w1.at[:, 0].set(dc_reg.w1),
            items.w2.at[:, 0].set(dc_reg.w2),
        )
        slot_lens = slot_lens.at[:, 0].set(dc_reg.len)

    eob_flag = jnp.zeros((B,), dtype=bool)
    # Empty spectral band: the reference's band math (encoder.rs:926-936,
    # values_per_scan = 64/(scans-1)) yields band [1, 1) for every
    # scans >= 34; write_ac_block over an empty range emits NOTHING (no
    # EOB — writer.rs:364-384 leaves zero_run at 0), so the scan's
    # entropy payload is empty.
    if spec.emit_ac and se > ss:
        L = se - ss
        band = q[:, ss:se]
        nz = band != 0
        idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), band.shape)
        lastnz = jax.lax.cummax(jnp.where(nz, idx, -1), axis=1)
        prevnz = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), lastnz[:, :-1]], axis=1
        )
        run = idx - prevnz - 1
        size = bit_length_i32(band)
        extra = (band - (band < 0).astype(jnp.int32)).astype(U32) & _mask(size)
        sym = ((run & 15) << 4) | size
        zrl_count = jnp.where(nz, run >> 4, 0)

        at = ac_tab[:, None]
        sym_lut = mxu_lookup(
            ac_packed.reshape(-1), at * 256 + sym, ac_packed.size
        ).astype(U32)
        sym_hs = (sym_lut >> 16).astype(jnp.int32)
        sym_hc = sym_lut & 0xFFFF
        # ZRL codes: table index varies only through `at` — select between
        # the (static) per-table scalars, no gather.
        zrl_hs = jnp.where(
            at == 0,
            ac_sizes[0, 0xF0].astype(jnp.int32),
            ac_sizes[1 % ac_sizes.shape[0], 0xF0].astype(jnp.int32),
        )
        zrl_hc = jnp.where(
            at == 0,
            ac_codes[0, 0xF0].astype(U32),
            ac_codes[1 % ac_codes.shape[0], 0xF0].astype(U32),
        )

        reg = reg96_empty((B, L))
        for t in range(3):  # up to 3 ZRL codes per item (run <= 62)
            active = (zrl_count > t) & nz
            reg = reg96_append(
                reg, jnp.where(active, zrl_hc, 0),
                jnp.where(active, zrl_hs, 0),
            )
        sym_bits = _shl(sym_hc, size) | extra
        sym_blen = jnp.where(nz, sym_hs + size, 0)
        reg = reg96_append(reg, jnp.where(nz, sym_bits, 0), sym_blen)

        items = Reg96(
            items.len.at[:, ss:se].set(reg.len),
            items.w0.at[:, ss:se].set(reg.w0),
            items.w1.at[:, ss:se].set(reg.w1),
            items.w2.at[:, ss:se].set(reg.w2),
        )
        slot_lens = slot_lens.at[:, ss:se].set(reg.len)
        eob_flag = lastnz[:, -1] < (L - 1)

    # ------------------------------------------------------------------
    # Tail item: EOB code + segment byte padding (1-bits).
    # ------------------------------------------------------------------
    eob_hs_tab = jnp.where(
        ac_tab == 0,
        ac_sizes[0, 0x00].astype(jnp.int32),
        ac_sizes[1 % ac_sizes.shape[0], 0x00].astype(jnp.int32),
    )
    eob_hc_tab = jnp.where(
        ac_tab == 0,
        ac_codes[0, 0x00].astype(U32),
        ac_codes[1 % ac_codes.shape[0], 0x00].astype(U32),
    )
    eob_hs = jnp.where(eob_flag, eob_hs_tab, 0)
    eob_hc = jnp.where(eob_flag, eob_hc_tab, 0)

    body_bits = jnp.sum(slot_lens, axis=1) + eob_hs  # per-block total
    # Segment sums via padded reshape (scatter-free).
    seg_id = bidx // seg
    padded = jnp.pad(body_bits, (0, n_seg * seg - B))
    seg_bits_body = padded.reshape(n_seg, seg).sum(axis=1)
    pad_len_seg = (-seg_bits_body) & 7
    seg_bits = seg_bits_body + pad_len_seg

    is_seg_last = (bidx % seg == seg - 1) | (bidx == B - 1)
    # Broadcast each segment's pad to its blocks without a gather.
    pad_per_block = jnp.broadcast_to(
        pad_len_seg[:, None], (n_seg, seg)
    ).reshape(-1)[:B]
    pad_len = jnp.where(is_seg_last, pad_per_block, 0)

    tail_len = eob_hs + pad_len
    tail_bits = _shl(eob_hc, pad_len) | _mask(pad_len)

    # ------------------------------------------------------------------
    # In-block tree: fold 64 slots, then append the tail item.
    # ------------------------------------------------------------------
    # Block-level caps must hold the busiest single block even when the
    # aggregate ladder budget is small (see device_encode.BUDGET_LADDER).
    caps = block_cap_schedule(max(budget_words, 16))
    lens = items.len
    words = jnp.stack([items.w0, items.w1, items.w2], axis=-1)
    overflow = jnp.asarray(False)
    for cap in caps:
        lens, words, ovf = merge_level(lens, words, cap)
        overflow = overflow | ovf

    block_cap = caps[-1] + 1
    lens = jnp.concatenate([lens, tail_len[:, None]], axis=1)
    tail_words = jnp.zeros((B, 2, words.shape[-1]), dtype=U32)
    tail_words = tail_words.at[:, 1, 0].set(
        _shl(tail_bits, 32 - jnp.minimum(tail_len, 32))
    )
    words = jnp.concatenate([words, tail_words[:, 1:2, :]], axis=1)
    lens, words, ovf = merge_level(lens, words, block_cap)
    overflow = overflow | ovf
    # -> lens (B, 1), words (B, 1, block_cap)

    lens = lens[:, 0]
    words = words[:, 0, :]

    # ------------------------------------------------------------------
    # Cross-block tree.
    # ------------------------------------------------------------------
    n = B
    n_pad = 1 << max(1, (n - 1).bit_length())
    if n_pad != n:
        lens = jnp.pad(lens, (0, n_pad - n))
        words = jnp.pad(words, ((0, n_pad - n), (0, 0)))

    cap = block_cap
    level_blocks = 1
    while n_pad > 1:
        level_blocks *= 2
        cap = min(
            2 * cap, budget_words * level_blocks + 16 * min(level_blocks, 16)
        )
        lens, words, ovf = merge_level(
            lens[None], words[None], cap
        )
        lens, words = lens[0], words[0]
        overflow = overflow | ovf
        n_pad //= 2

    total_bits = lens[0]
    return words[0], total_bits, seg_bits, overflow


def words_to_bytes(words):
    """MSB-first uint32 words -> uint8 byte stream (big-endian order)."""
    b0 = (words >> 24) & 0xFF
    b1 = (words >> 16) & 0xFF
    b2 = (words >> 8) & 0xFF
    b3 = words & 0xFF
    return jnp.stack([b0, b1, b2, b3], axis=-1).reshape(-1).astype(jnp.uint8)
