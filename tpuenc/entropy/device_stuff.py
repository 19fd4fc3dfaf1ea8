"""Device-side segment realignment, 0xFF stuffing and RST insertion.

The v2 packer emits one raw bit-concatenation of every scan's per-block
codes; round 3 finished it on the host (`native.realign_segments`): shift
each restart segment to a byte boundary, pad the tail byte with 1-bits
(reference ``writer.rs:138-145``), stuff 0xFF -> 0xFF 0x00
(``writer.rs:156-167``) and splice RST markers (``writer.rs:302-306``,
``encoder.rs:748-757``).  That costs ~0.7-1.7 ms of host CPU per 3.6 MP
image — overlapped in batch mode, but coupling throughput to host cores.

This module is the SURVEY §7 step-4 device formulation (gated behind
``TPUENC_DEVICE_STUFF=1``): two gather/prefix-sum passes over the byte
stream, entirely in XLA —

1. **Realign**: output byte j maps to segment k (searchsorted over the
   static segment byte starts), local byte l, source bit
   ``seg_start_bits[k] + 8 l``; the byte is a funnel of two stream words,
   and each segment's final byte ORs in the 1-padding.
2. **Stuff + markers**: the output position of realigned byte j is
   ``F(j) = j + (#0xFF before j) + 2 * (#markers before j's segment)``;
   the stuffed stream is built by inverting the monotone map F with a
   searchsorted gather — position p holds the source byte at
   ``i = argmax F <= p``, a 0x00 if it trails a 0xFF, or one of the two
   RST marker bytes in inter-segment gaps.

The host finish then degenerates to slicing per-scan byte ranges out of
one fetched buffer.  Byte parity with the host path is pinned by
tests/test_device_stuff.py against the golden fixtures.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def marker_plan(seg_structure: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-segment marker layout for a scan plan.

    ``seg_structure``: number of restart segments per scan, in plan
    order.  Returns ``(emit_marker (S,) bool, marker_m (S,) uint8)``:
    segment k is followed by RST(marker_m[k]) iff emit_marker[k] — every
    segment except the last of its scan, with m cycling 0..7 within the
    scan (encoder.rs:748-757)."""
    emit = []
    ms = []
    for nseg in seg_structure:
        for i in range(nseg):
            emit.append(i != nseg - 1)
            ms.append(i % 8)
    return np.asarray(emit, bool), np.asarray(ms, np.uint8)


@lru_cache(maxsize=32)
def _build_stuff_fn(S: int, emit_marker: tuple, marker_m: tuple,
                    cap_words: int):
    """jit(words (cap_words,) u32, seg_bits (S,) i32) ->
    (out (cap_out,) u8, seg_out_bytes (S,) i32).

    ``seg_out_bytes`` are the FINAL per-segment byte counts (aligned data
    + stuffed zeros + trailing marker bytes); their prefix sums are the
    scan/segment boundaries in ``out``."""
    emit = np.asarray(emit_marker, bool)
    mbytes = np.asarray(marker_m, np.uint8)
    # Realigned byte capacity: every segment rounds up to a byte.
    N1 = cap_words * 4 + S
    # Stuffed capacity: JPEG entropy data is ~0.4% 0xFF; 1/4 slack is
    # overflow-safe in practice and checked at runtime.
    cap_out = N1 + N1 // 4 + 2 * S + 256

    def fn(words, seg_bits):
        seg_bits = seg_bits.astype(jnp.int32)
        seg_start_bits = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(seg_bits)[:-1]]
        )
        seg_nbytes = (seg_bits + 7) >> 3
        seg_out_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(seg_nbytes)[:-1]]
        )
        n1 = jnp.sum(seg_nbytes)

        j = jnp.arange(N1, dtype=jnp.int32)
        k = jnp.searchsorted(seg_out_start, j, side="right").astype(
            jnp.int32
        ) - 1
        k = jnp.clip(k, 0, S - 1)
        l = j - seg_out_start[k]
        src_bit = seg_start_bits[k] + 8 * l
        w = src_bit >> 5
        sh = (src_bit & 31).astype(U32)
        w = jnp.clip(w, 0, cap_words - 1)
        w1 = jnp.clip(w + 1, 0, cap_words - 1)
        lo = jnp.where(
            sh == 0, jnp.uint32(0), words[w1] >> ((32 - sh) & 31)
        )
        b = ((words[w] << sh) | lo) >> 24
        # 1-pad the final (partial) byte of each segment
        # (writer.rs:138-145: finalize pads with 1 bits).
        last = l == seg_nbytes[k] - 1
        vbits = seg_bits[k] - 8 * l  # valid bits in the last byte, 1..8
        pad = jnp.where(
            last, (jnp.uint32(1) << ((8 - vbits).astype(U32) & 31)) - 1,
            jnp.uint32(0),
        )
        B1 = (b | pad).astype(jnp.uint32) & 0xFF
        valid1 = j < n1
        B1 = jnp.where(valid1, B1, 0)

        is_ff = (B1 == 0xFF) & valid1
        stuff_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(is_ff.astype(jnp.int32))[:-1]]
        )
        markers_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(jnp.asarray(emit, jnp.int32))[:-1]]
        )
        F = j + stuff_before + 2 * markers_before[k]
        total_out = (
            n1
            + jnp.sum(is_ff.astype(jnp.int32))
            + 2 * int(emit.sum())
        )
        # Mark invalid tail entries with +inf-like sentinels so the
        # searchsorted inversion never selects them.
        F = jnp.where(valid1, F, jnp.int32(2**30))

        p = jnp.arange(cap_out, dtype=jnp.int32)
        i = jnp.searchsorted(F, p, side="right").astype(jnp.int32) - 1
        i = jnp.clip(i, 0, N1 - 1)
        d = p - F[i]
        src = B1[i]
        ff_i = is_ff[i]
        mseg = k[i]
        # d == 0: the byte itself; d == 1 after 0xFF: stuffed zero;
        # otherwise the inter-segment marker pair.
        moff = d - 1 - ff_i.astype(jnp.int32)
        em = jnp.asarray(emit)[mseg]
        mm = jnp.asarray(mbytes.astype(np.int32))[mseg]
        out = jnp.where(
            d == 0,
            src,
            jnp.where(
                (d == 1) & ff_i,
                jnp.uint32(0),
                jnp.where(
                    em & (moff == 0),
                    jnp.uint32(0xFF),
                    jnp.where(
                        em & (moff == 1),
                        (0xD0 + mm).astype(jnp.uint32),
                        jnp.uint32(0),
                    ),
                ),
            ),
        )
        out = jnp.where(p < total_out, out, 0).astype(jnp.uint8)

        # Final per-segment byte counts: aligned bytes + stuffed zeros +
        # marker pair.
        seg_ids = k
        stuff_per_seg = jax.ops.segment_sum(
            is_ff.astype(jnp.int32), seg_ids, num_segments=S
        )
        seg_out_bytes = (
            seg_nbytes + stuff_per_seg
            + 2 * jnp.asarray(emit, jnp.int32)
        )
        return out, seg_out_bytes, total_out

    return jax.jit(fn)


def device_stuff(buf_words, seg_bits, seg_structure):
    """Run the device realign+stuff pass.

    ``buf_words``: (W,) uint32 raw stream; ``seg_bits``: (S,) per-segment
    UNPADDED bit counts (device or host array); ``seg_structure``: static
    per-scan segment counts.  Returns ``(out_bytes_device (cap,) u8,
    seg_out_bytes (S,) i32 device, total_out traced scalar)`` — the
    caller fetches ``out[:total]`` and splits on the host."""
    emit, ms = marker_plan(seg_structure)
    fn = _build_stuff_fn(
        int(seg_bits.shape[0]), tuple(emit.tolist()),
        tuple(ms.tolist()), int(buf_words.shape[0]),
    )
    return fn(buf_words, jnp.asarray(seg_bits))
