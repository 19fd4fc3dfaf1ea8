"""Device-side (jnp) entropy statistics.

jnp ports of the numpy symbolization in ``entropy.symbols`` used where the
data should stay on device: per-shard Huffman symbol histograms that are
``psum``-reduced across the mesh in the sharded two-pass optimized-table
path (the TPU equivalent of the reference's serial histogram loop,
``/root/reference/src/encoder.rs:1086-1200``), and per-block bit-size
accounting used for bitstream length planning.

Magnitude categories are computed branch-free as a sum of threshold
comparisons (|v| >= 2^k), which vectorizes perfectly on the VPU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bit_length(v):
    """Magnitude category of int values (0 for 0), elementwise."""
    av = jnp.abs(v.astype(jnp.int32))
    size = jnp.zeros_like(av)
    for k in range(16):
        size = size + (av >= (1 << k)).astype(jnp.int32)
    return size


def ac_stats(blocks, start: int, end: int, cm: bool = False):
    """Vectorized run-length stats for band [start, end): returns
    (nz, zrl, sym, size) arrays plus eob flags — jnp twin of
    ``symbols.ac_symbols``.

    ``cm=False``: ``blocks`` is block-major (B, 64), the slot axis is 1.
    ``cm=True``: coefficient-major (64, B) as produced by the Pallas
    pipeline — the same math runs along axis 0, keeping the stream in its
    native layout (no device transpose)."""
    axis = 0 if cm else 1
    band = (blocks[start:end, :] if cm else blocks[:, start:end]).astype(
        jnp.int32
    )
    L = end - start
    nz = band != 0
    if L == 0:
        # Empty band ([1, 1) for scans >= 34, encoder.rs:926-936): no
        # symbols and no EOB (writer.rs:364-384), so no histogram mass.
        B = blocks.shape[1] if cm else blocks.shape[0]
        zero = jnp.zeros(band.shape, jnp.int32)
        return nz, zero, zero, zero, jnp.zeros((B,), bool)
    shape = (L, 1) if cm else (1, L)
    idx = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32).reshape(shape), band.shape
    )
    lastnz = jax_cummax(jnp.where(nz, idx, -1), axis)
    if cm:
        prev = jnp.concatenate(
            [jnp.full((1,) + band.shape[1:], -1, dtype=jnp.int32),
             lastnz[:-1, :]],
            axis=0,
        )
    else:
        prev = jnp.concatenate(
            [jnp.full((band.shape[0], 1), -1, dtype=jnp.int32),
             lastnz[:, :-1]],
            axis=1,
        )
    run = idx - prev - 1
    size = bit_length(band)
    sym = ((run & 15) << 4) | size
    zrl = jnp.where(nz, run >> 4, 0)
    eob = (lastnz[-1, :] if cm else lastnz[:, -1]) < (L - 1)
    return nz, zrl, sym, size, eob


def jax_cummax(x, axis: int = 1):
    import jax.lax as lax

    return lax.cummax(x, axis=axis)


def _bincount_small(values, n_bins: int):
    """n-bin compare-reduce histogram.  TPU scatter-adds
    (``hist.at[v].add(1)``) lower to a serial loop (~54 ms for a 6M-element
    histogram); the fused compare-reduce runs the same count in ~1.4 ms on
    v5e, and keeping n_bins at the actual category count (17 for DC sizes
    instead of 257) cuts the compare work 15x further."""
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    eq = (values.reshape(-1, 1) == bins.reshape(1, n_bins)).astype(jnp.int32)
    return jnp.sum(eq, axis=0)


def ac_histogram(blocks, start: int, end: int, valid=None, cm: bool = False):
    """257-bin AC symbol histogram of one spectral band (device).

    ``valid`` is an optional (N,) bool mask: blocks outside it contribute
    nothing — used by the striped path to exclude stripe-alignment padding
    rows from the table statistics.

    The (run, size) count matrix is computed as a one-hot int8 matmul —
    ``onehot(run)ᵀ @ onehot(size)`` with int32 accumulation — so the
    histogram rides the MXU instead of a 257-wide VPU compare-reduce
    (~3x fewer ms on the flagship shape).  ``sym = run<<4 | size`` means
    bin layout (16, 16) row-major equals the symbol value; the size==16
    column (unreachable for int16 coefficients but kept for exactness)
    aliases into bin (run+1)<<4 exactly as ``np.bincount`` does on the
    host, with run==15/size==16 (sym 256) dropped by both."""
    nz, zrl, sym, size, eob = ac_stats(blocks, start, end, cm=cm)
    if valid is not None:
        vmask = valid[None, :] if cm else valid[:, None]
        nz = nz & vmask
        zrl = jnp.where(vmask, zrl, 0)
        eob = eob & valid
    run4 = (sym >> 4) & 15
    fr = run4.reshape(-1)
    fs = size.reshape(-1)
    oh_r = (
        (fr[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :])
        & nz.reshape(-1)[:, None]
    ).astype(jnp.int8)
    oh_s = (
        fs[:, None] == jnp.arange(17, dtype=jnp.int32)[None, :]
    ).astype(jnp.int8)
    cnt = jax.lax.dot_general(
        oh_r, oh_s,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (16, 17): count of nonzero coefficients per (run & 15, size)
    hist = jnp.concatenate(
        [cnt[:, :16].reshape(256), jnp.zeros(1, dtype=jnp.int32)]
    )
    hist = hist.at[jnp.arange(1, 16) * 16].add(cnt[:15, 16])
    hist = hist.at[0xF0].add(jnp.sum(zrl))
    hist = hist.at[0x00].add(jnp.sum(eob.astype(jnp.int32)))
    return hist


def dc_histogram(blocks, cm: bool = False):
    """257-bin DC-size histogram over one component stream (no restart
    resets, matching encoder.rs:1100-1117)."""
    dc = (blocks[0, :] if cm else blocks[:, 0]).astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32), dc[:-1]])
    sizes = bit_length(dc - prev)
    return jnp.pad(_bincount_small(sizes, 17), (0, 240))


def scan_histograms(
    comp_blocks: Sequence,
    components,
    progressive_scans: Optional[int],
    cm: bool = False,
    pallas: Optional[bool] = None,
) -> Tuple:
    """Per-table (dc, ac) histograms, device-side, ready for psum.

    Mirrors ``huffopt.build_histograms`` except the reserved-symbol seed
    (freq[256] = 1) is added host-side after the mesh reduction so it is
    counted exactly once.

    ``pallas`` routes the AC symbolization through the Mosaic kernel
    (``pallas_hist``, coefficient-major streams only) — ~4x less HBM
    traffic than the XLA formulation; default: on when ``cm`` unless
    ``TPUENC_PALLAS_HIST=0``.  Identical counts either way
    (tests/test_entropy.py).
    """
    import os

    from .huffopt import progressive_bands

    if pallas is None:
        pallas = cm and os.environ.get("TPUENC_PALLAS_HIST", "1") != "0"
    if pallas:
        from .pallas_hist import ac_histograms_pallas_multiband

        interpret = jax.default_backend() != "tpu"

        def ac_all_bands(blocks, bands):
            # All bands of one component share one kernel launch (tile
            # load + lastnz scan + size categories computed once, counts
            # accumulated in VMEM); <= 8 bands per launch bounds the
            # scratch and the in-kernel unroll.
            out = []
            for k in range(0, len(bands), 8):
                out += ac_histograms_pallas_multiband(
                    blocks, tuple(bands[k:k + 8]), interpret
                )
            return out
    else:
        def ac_all_bands(blocks, bands):
            return [
                ac_histogram(blocks, start, end, cm=cm)
                for start, end in bands
            ]

    if progressive_scans is not None:
        bands = progressive_bands(progressive_scans)
    else:
        bands = [(1, 64)]

    max_tables = min(len(components), 2)
    out = []
    for table in range(max_tables):
        dc = jnp.zeros(257, dtype=jnp.int32)
        ac = jnp.zeros(257, dtype=jnp.int32)
        for comp, blocks in zip(components, comp_blocks):
            if comp.dc_huffman_table == table:
                dc = dc + dc_histogram(blocks, cm=cm)
            if comp.ac_huffman_table == table:
                for h in ac_all_bands(blocks, bands):
                    ac = ac + h
        out.append((dc, ac))
    return tuple(out)
