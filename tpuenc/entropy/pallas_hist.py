"""Pallas AC-symbolization kernel for the two-pass Huffman statistics.

The optimized-table flow (reference ``encoder.rs:1086-1200``) needs a
257-bin AC symbol histogram per table.  The XLA formulation
(``device.ac_stats``) pays a full elementwise pass per intermediate at
every fusion boundary — the 6-step last-nonzero scan alone rewrites the
band several times over (measured 0.69 ms per 3.5 MP component on v5e,
2.8 ms of the optimized mode's 5.8 ms total).

This kernel reuses the phase-1 pack kernel's register-resident
symbolization (``pallas_pack._pack_tile_kernel``): one read of the
coefficient-major (64, L) stream, the log-shift last-nonzero scan along
sublanes, run/size category math on the VPU — and emits

* ``run4`` (64, L) int8 — ``run & 15`` for countable elements,
  **16 for everything else** (zero coefficient, outside the band,
  past ``n_blocks``), so the downstream one-hot ``fr == iota16`` masks
  invalid elements for free;
* ``size`` (64, L) int8 — magnitude category (0 for zeros);
* per-tile lane-partial ZRL counts and EOB flags (tiny int32 rows).

The (16, 17) joint count then rides the MXU exactly as before
(``device.ac_histogram``'s one-hot int8 matmul), which is already at
its HBM floor; only the symbolization moves into Mosaic.

Byte-exactness: ``device.scan_histograms`` (and therefore the K.2
tables and the final bitstream) must not change — checked against the
XLA path and the host oracle by tests/test_entropy.py and the golden
fixtures.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from .pallas_pack import _bit_length

_TILE = 512


def _hist_sym_kernel(q_ref, run4_ref, size_ref, parts_ref, *,
                     tile: int, n_blocks: int, ss: int, se: int):
    """One grid step symbolizes ``tile`` blocks of one (64, L) stream."""
    from jax.experimental import pallas as pl

    T = tile
    g = pl.program_id(0)
    bidx = g * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = bidx < n_blocks  # (1, T)

    q = q_ref[:].astype(jnp.int32)  # (64, T)
    slot = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

    in_band = (slot >= ss) & (slot < se)
    band = jnp.where(in_band, q, 0)
    nz = band != 0

    # Running maximum of last-nonzero slot via log-shifts (sublanes),
    # identical to the pack kernel's scan.
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
    prevnz = jnp.maximum(prevnz, ss - 1)
    run = slot - prevnz - 1

    size = _bit_length(jnp.abs(band))
    countable = nz & jnp.broadcast_to(valid, (64, T))

    run4_ref[:] = jnp.where(countable, run & 15, 16).astype(jnp.int8)
    size_ref[:] = size.astype(jnp.int8)

    # Lane-partial ZRL count (row 0): each countable element contributes
    # run >> 4 ZRL codes (huffopt.ac_histogram semantics — attached to
    # the run-ending nonzero, not to the zero slots).  Row 1: EOB flags —
    # the band's last nonzero sits before se-1 (or band all-zero).
    # Rows 2-7 pad the block to a legal (8, T) Mosaic output shape.
    zrl = jnp.sum(jnp.where(countable, run >> 4, 0), axis=0,
                  dtype=jnp.int32).reshape(1, T)
    eob = ((lastnz[se - 1:se, :] < (se - 1)) & valid).astype(jnp.int32)
    parts_ref[:] = jnp.concatenate(
        [zrl, eob, jnp.zeros((6, T), jnp.int32)], axis=0
    )


@lru_cache(maxsize=64)
def _build_sym_fn(n_blocks: int, ss: int, se: int, interpret: bool):
    from jax.experimental import pallas as pl

    T = _TILE
    grid = (n_blocks + T - 1) // T

    kernel = lambda *refs: _hist_sym_kernel(  # noqa: E731
        *refs, tile=T, n_blocks=n_blocks, ss=ss, se=se
    )
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((64, T), lambda g: (0, g))],
        out_specs=[
            pl.BlockSpec((64, T), lambda g: (0, g)),
            pl.BlockSpec((64, T), lambda g: (0, g)),
            pl.BlockSpec((8, T), lambda g: (g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((64, grid * T), jnp.int8),
            jax.ShapeDtypeStruct((64, grid * T), jnp.int8),
            jax.ShapeDtypeStruct((grid * 8, T), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(stream_cm):
        # Pad the lane axis to the tile grid; padding lanes read as
        # zeros and are masked by ``n_blocks`` inside the kernel anyway.
        L = stream_cm.shape[1]
        if L < grid * T:
            stream_cm = jnp.pad(stream_cm, ((0, 0), (0, grid * T - L)))
        return call(stream_cm)

    return fn


def _hist_count_kernel(q_ref, counts_ref, *, tile: int, n_blocks: int,
                       n_tiles: int, bands):
    """Fully in-kernel multi-band histogramming: symbolize the tile once
    (shared last-nonzero scan / size categories, like the multi-band pack
    kernel) and accumulate each band's (16, 17) joint (run & 15, size)
    count, ZRL total and EOB count into a VMEM-resident partial that is
    only written back once — no (64, L) int8 symbol streams and no
    (N, 16)/(N, 17) one-hot operands ever reach HBM (the cost that made
    the two-pass statistics ~0.6-0.9 ms/3.6 MP).

    ``counts_ref`` is (n_bands * 24, 128) int32: per band, rows 0..15 =
    joint count (col s = size), row 16 col 0 = ZRL total, row 17 col 0 =
    EOB count.  Counts accumulate across sequential grid steps.
    """
    from jax.experimental import pallas as pl

    T = tile
    g = pl.program_id(0)
    bidx = g * T + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid = bidx < n_blocks  # (1, T)

    @pl.when(g == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    q = q_ref[:].astype(jnp.int32)  # (64, T)
    slot = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

    ss_min = min(b[0] for b in bands)
    se_max = max(b[1] for b in bands)
    in_any = (slot >= ss_min) & (slot < se_max)
    band = jnp.where(in_any, q, 0)
    nz = band != 0

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
    size = _bit_length(jnp.abs(band))
    valid64 = jnp.broadcast_to(valid, (64, T))

    # One-hot size rows, shared by every band (size is band-independent).
    iota17 = jax.lax.broadcasted_iota(jnp.int32, (17, T), 0)
    oh_s_rows = {
        i: (jnp.broadcast_to(size[i:i + 1], (17, T)) == iota17).astype(
            jnp.int8
        )
        for i in range(max(1, ss_min), se_max)
    }
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, T), 0)

    for b, (ss, se) in enumerate(bands):
        in_band = (slot >= ss) & (slot < se)
        prevnz = jnp.maximum(prevnz_g, ss - 1)
        run = slot - prevnz - 1
        countable = nz & in_band & valid64
        run4 = jnp.where(countable, run & 15, -1)

        # The joint (run & 15, size) count as ONE lane-contracted dot:
        # per slot row i, lhs_i = onehot16(run4[i]) (16, T) and
        # rhs_i = onehot17(size[i]) (17, T); lane-concatenating the rows
        # makes dot(lhs, rhsT) = sum_i lhs_i @ rhs_iT — elements stay in
        # their native (sublane, lane) tiling, nothing is reshaped.
        lhs = jnp.concatenate(
            [
                (jnp.broadcast_to(run4[i:i + 1], (16, T)) == iota16).astype(
                    jnp.int8
                )
                for i in range(ss, se)
            ],
            axis=1,
        )
        rhs = jnp.concatenate(
            [oh_s_rows[i] for i in range(ss, se)], axis=1
        )
        cnt = jax.lax.dot_general(
            lhs, rhs,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (16, 17): invalid elements (run4 == -1) fall in no run bin
        zrl = jnp.sum(jnp.where(countable, run >> 4, 0))
        eobf = (lastnz[se - 1:se, :] < (se - 1)) & valid
        eob = jnp.sum(eobf.astype(jnp.int32))

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        tail = (
            jnp.where((srow == 0) & (lane == 0), zrl, 0)
            + jnp.where((srow == 1) & (lane == 0), eob, 0)
        )
        upd = jnp.concatenate(
            [jnp.pad(cnt, ((0, 0), (0, 128 - 17))), tail], axis=0
        )  # (24, 128)
        counts_ref[b * 24:(b + 1) * 24] += upd


@lru_cache(maxsize=64)
def _build_count_fn(n_blocks: int, bands, interpret: bool):
    from jax.experimental import pallas as pl

    T = _TILE
    grid = (n_blocks + T - 1) // T

    kernel = lambda *refs: _hist_count_kernel(  # noqa: E731
        *refs, tile=T, n_blocks=n_blocks, n_tiles=grid, bands=bands
    )
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((64, T), lambda g: (0, g))],
        out_specs=[pl.BlockSpec((len(bands) * 24, 128), lambda g: (0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((len(bands) * 24, 128), jnp.int32),
        ],
        interpret=interpret,
    )

    def fn(stream_cm):
        L = stream_cm.shape[1]
        if L < grid * T:
            stream_cm = jnp.pad(stream_cm, ((0, 0), (0, grid * T - L)))
        return call(stream_cm)[0]

    return fn


def ac_histograms_pallas_multiband(stream_cm, bands, interpret: bool = False):
    """Per-band 257-bin AC histograms for SEVERAL spectral bands of one
    component in one kernel launch (shared symbolization, in-kernel
    count accumulation).  Returns a list of (257,) int32 arrays in band
    order; empty bands ([1, 1) for scans >= 34) get zero mass."""
    live = tuple(b for b in bands if b[0] < b[1])
    if not live:
        return [jnp.zeros(257, jnp.int32) for _ in bands]
    n_blocks = stream_cm.shape[1]
    fn = _build_count_fn(n_blocks, live, interpret)
    counts = fn(stream_cm)
    by_band = {}
    for i, b in enumerate(live):
        blk = counts[i * 24:(i + 1) * 24]
        cnt = blk[:16, :17]
        hist = jnp.concatenate(
            [cnt[:, :16].reshape(256), jnp.zeros(1, dtype=jnp.int32)]
        )
        hist = hist.at[jnp.arange(1, 16) * 16].add(cnt[:15, 16])
        hist = hist.at[0xF0].add(blk[16, 0])
        hist = hist.at[0x00].add(blk[17, 0])
        by_band[b] = hist
    zero = jnp.zeros(257, jnp.int32)
    return [by_band.get(b, zero) for b in bands]


def ac_histogram_pallas(stream_cm, start: int, end: int,
                        interpret: bool = False):
    """257-bin AC symbol histogram of one spectral band — drop-in twin of
    ``device.ac_histogram(..., cm=True)`` with the symbolization in
    Mosaic and the (16, 17) joint count on the MXU."""
    if start >= end:
        # Empty band ([1, 1) for scans >= 34, encoder.rs:926-936): no
        # symbols, no EOB (writer.rs:364-384) — zero histogram mass.
        return jnp.zeros(257, jnp.int32)
    n_blocks = stream_cm.shape[1]
    fn = _build_sym_fn(n_blocks, start, end, interpret)
    run4, size, parts = fn(stream_cm)
    zrl_parts = parts.reshape(-1, 8, parts.shape[1])[:, 0]
    eob_parts = parts.reshape(-1, 8, parts.shape[1])[:, 1]

    fr = run4.reshape(-1)
    fs = size.reshape(-1)
    oh_r = (
        fr[:, None] == jnp.arange(16, dtype=jnp.int8)[None, :]
    ).astype(jnp.int8)
    oh_s = (
        fs[:, None] == jnp.arange(17, dtype=jnp.int8)[None, :]
    ).astype(jnp.int8)
    cnt = jax.lax.dot_general(
        oh_r, oh_s,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (16, 17)
    hist = jnp.concatenate(
        [cnt[:, :16].reshape(256), jnp.zeros(1, dtype=jnp.int32)]
    )
    hist = hist.at[jnp.arange(1, 16) * 16].add(cnt[:15, 16])
    hist = hist.at[0xF0].add(jnp.sum(zrl_parts))
    hist = hist.at[0x00].add(jnp.sum(eob_parts))
    return hist
