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


def ac_histogram_pallas(stream_cm, start: int, end: int,
                        interpret: bool = False):
    """257-bin AC symbol histogram of one spectral band — drop-in twin of
    ``device.ac_histogram(..., cm=True)`` with the symbolization in
    Mosaic and the (16, 17) joint count on the MXU."""
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
