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

import jax.numpy as jnp
import numpy as np


def bit_length(v):
    """Magnitude category of int values (0 for 0), elementwise."""
    av = jnp.abs(v.astype(jnp.int32))
    size = jnp.zeros_like(av)
    for k in range(16):
        size = size + (av >= (1 << k)).astype(jnp.int32)
    return size


def ac_stats(blocks, start: int, end: int):
    """Vectorized run-length stats for band [start, end): returns
    (nz, zrl, sym, size) arrays plus eob flags — jnp twin of
    ``symbols.ac_symbols``."""
    band = blocks[:, start:end].astype(jnp.int32)
    L = end - start
    nz = band != 0
    idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), band.shape)
    lastnz = jax_cummax(jnp.where(nz, idx, -1))
    prev = jnp.concatenate(
        [jnp.full((band.shape[0], 1), -1, dtype=jnp.int32), lastnz[:, :-1]],
        axis=1,
    )
    run = idx - prev - 1
    size = bit_length(band)
    sym = ((run & 15) << 4) | size
    zrl = jnp.where(nz, run >> 4, 0)
    eob = lastnz[:, -1] < (L - 1)
    return nz, zrl, sym, size, eob


def jax_cummax(x):
    import jax.lax as lax

    return lax.cummax(x, axis=1)


def _bincount257(values):
    """257-bin histogram of int32 values via broadcast-compare-reduce.

    TPU scatter-adds (``hist.at[v].add(1)``) lower to a serial loop and
    cost ~54 ms for a 6M-element flagship histogram; the fused
    compare-reduce runs the same count in ~1.4 ms (measured on v5e).
    """
    bins = jnp.arange(257, dtype=jnp.int32)
    eq = (values.reshape(-1, 1) == bins.reshape(1, 257)).astype(jnp.int32)
    return jnp.sum(eq, axis=0)


def ac_histogram(blocks, start: int, end: int, valid=None):
    """257-bin AC symbol histogram of one spectral band (device).

    ``valid`` is an optional (N,) bool mask: blocks outside it contribute
    nothing — used by the striped path to exclude stripe-alignment padding
    rows from the table statistics."""
    nz, zrl, sym, _, eob = ac_stats(blocks, start, end)
    if valid is not None:
        nz = nz & valid[:, None]
        zrl = jnp.where(valid[:, None], zrl, 0)
        eob = eob & valid
    sym_or_pad = jnp.where(nz, sym, 256)  # route zeros into the unused bin
    hist = _bincount257(sym_or_pad.reshape(-1))
    hist = hist.at[256].set(0)
    hist = hist.at[0xF0].add(jnp.sum(zrl))
    hist = hist.at[0x00].add(jnp.sum(eob.astype(jnp.int32)))
    return hist


def dc_histogram(blocks):
    """257-bin DC-size histogram over one component stream (no restart
    resets, matching encoder.rs:1100-1117)."""
    dc = blocks[:, 0].astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32), dc[:-1]])
    sizes = bit_length(dc - prev)
    return _bincount257(sizes)


def scan_histograms(
    comp_blocks: Sequence,
    components,
    progressive_scans: Optional[int],
) -> Tuple:
    """Per-table (dc, ac) histograms, device-side, ready for psum.

    Mirrors ``huffopt.build_histograms`` except the reserved-symbol seed
    (freq[256] = 1) is added host-side after the mesh reduction so it is
    counted exactly once.
    """
    from .huffopt import progressive_bands

    max_tables = min(len(components), 2)
    out = []
    for table in range(max_tables):
        dc = jnp.zeros(257, dtype=jnp.int32)
        ac = jnp.zeros(257, dtype=jnp.int32)
        for comp, blocks in zip(components, comp_blocks):
            if comp.dc_huffman_table == table:
                dc = dc + dc_histogram(blocks)
            if comp.ac_huffman_table == table:
                if progressive_scans is not None:
                    for start, end in progressive_bands(progressive_scans):
                        ac = ac + ac_histogram(blocks, start, end)
                else:
                    ac = ac + ac_histogram(blocks, 1, 64)
        out.append((dc, ac))
    return tuple(out)
