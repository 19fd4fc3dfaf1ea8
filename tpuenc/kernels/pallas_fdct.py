"""Pallas fused fDCT + zigzag + quantize kernel.

One Mosaic kernel runs the whole block transform hot path — level-shifted
pixels in, zigzag-ordered quantized coefficients out — in a TPU-native
layout: coefficient index on the sublane axis (64 rows), block index on the
lane axis, so every LL&M butterfly line is a full-width elementwise vector
op and the zigzag reorder is 64 static row moves inside VMEM.

Semantics are identical to ``kernels.fdct`` + ``kernels.quantize``
(reference ``fdct.rs:107-238`` staged fixed-point rounding and
``quantization.rs:291-307`` reciprocal division), verified bit-exact in
tests.  The XLA path remains the default; this kernel is selected with
``TPUENC_PALLAS_FDCT=1`` on TPU backends and is the template for the fully
fused Pallas encode pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tables import QUANT_SHIFT, ZIGZAG, QuantizationTable
from .fdct import (
    FIX_0_298631336,
    FIX_0_390180644,
    FIX_0_541196100,
    FIX_0_765366865,
    FIX_0_899976223,
    FIX_1_175875602,
    FIX_1_501321110,
    FIX_1_847759065,
    FIX_1_961570560,
    FIX_2_053119869,
    FIX_2_562915447,
    FIX_3_072711026,
    CONST_BITS,
    PASS1_BITS,
)

_TILE_B = 512  # blocks per grid step (lane-major)


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _butterfly(rows, first_pass):
    """One 8-point LL&M butterfly over 8 row vectors (each (TILE_B,))."""
    tmp0 = rows[0] + rows[7]
    tmp7 = rows[0] - rows[7]
    tmp1 = rows[1] + rows[6]
    tmp6 = rows[1] - rows[6]
    tmp2 = rows[2] + rows[5]
    tmp5 = rows[2] - rows[5]
    tmp3 = rows[3] + rows[4]
    tmp4 = rows[3] - rows[4]

    tmp10 = tmp0 + tmp3
    tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 - tmp2

    out = [None] * 8
    if first_pass:
        out[0] = (tmp10 + tmp11) << PASS1_BITS
        out[4] = (tmp10 - tmp11) << PASS1_BITS
        shift = CONST_BITS - PASS1_BITS
    else:
        out[0] = _descale(tmp10 + tmp11, PASS1_BITS)
        out[4] = _descale(tmp10 - tmp11, PASS1_BITS)
        shift = CONST_BITS + PASS1_BITS

    z1 = (tmp12 + tmp13) * FIX_0_541196100
    out[2] = _descale(z1 + tmp13 * FIX_0_765366865, shift)
    out[6] = _descale(z1 + tmp12 * -FIX_1_847759065, shift)

    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * FIX_1_175875602

    tmp4 = tmp4 * FIX_0_298631336
    tmp5 = tmp5 * FIX_2_053119869
    tmp6 = tmp6 * FIX_3_072711026
    tmp7 = tmp7 * FIX_1_501321110
    z1 = z1 * -FIX_0_899976223
    z2 = z2 * -FIX_2_562915447
    z3 = z3 * -FIX_1_961570560
    z4 = z4 * -FIX_0_390180644

    z3 = z3 + z5
    z4 = z4 + z5

    out[7] = _descale(tmp4 + z1 + z3, shift)
    out[5] = _descale(tmp5 + z2 + z4, shift)
    out[3] = _descale(tmp6 + z2 + z3, shift)
    out[1] = _descale(tmp7 + z1 + z4, shift)
    return out


def _kernel(x_ref, recip_ref, corr_ref, out_ref):
    # x_ref: (64, TILE_B) int32 level-shifted samples, natural order
    # (row k = coefficient y*8+x); recip/corr: (64, 1) int32 companion
    # vectors ALREADY in zigzag order; out_ref: (64, TILE_B) int16.
    rows = [x_ref[k, :] for k in range(64)]

    # Pass 1: rows of each block — combine the 8 columns of each y-group.
    mid = [None] * 64
    for y in range(8):
        group = _butterfly([rows[y * 8 + x] for x in range(8)], True)
        for x in range(8):
            mid[y * 8 + x] = group[x]

    # Pass 2: columns — combine across y for each x.
    final = [None] * 64
    for x in range(8):
        group = _butterfly([mid[y * 8 + x] for y in range(8)], False)
        for y in range(8):
            final[y * 8 + x] = group[y]

    # Fused zigzag + reciprocal quantize: emit row j = quantized
    # coefficient at natural index ZIGZAG[j].
    for j in range(64):
        v = final[int(ZIGZAG[j])]
        absv = jnp.abs(v)
        q = ((absv + corr_ref[j, 0]) * recip_ref[j, 0]) >> QUANT_SHIFT
        out_ref[j, :] = jnp.where(v < 0, -q, q).astype(jnp.int16)


@functools.lru_cache(maxsize=16)
def _build(n_tiles: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Interpreter mode off-TPU so the kernel is testable on CPU.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((64, n_tiles * _TILE_B), jnp.int16),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((64, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (64, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )


def fdct_quantize_pallas_cm(x_cm, table: QuantizationTable):
    """Coefficient-major fused transform: ``x_cm`` is int (64, B) with
    sample index on sublanes and block index on lanes — the kernel's
    native layout, so no transposes are emitted at all.  Returns int16
    (64, B) zigzag-ordered quantized coefficients (bit-exact with
    :func:`fdct_quantize_pallas` transposed)."""
    B = x_cm.shape[1]
    n_tiles = -(-B // _TILE_B)
    padded = n_tiles * _TILE_B
    x = x_cm.astype(jnp.int32)
    if padded != B:
        x = jnp.pad(x, ((0, 0), (0, padded - B)))
    recip = jnp.asarray(
        np.asarray(table.reciprocals)[ZIGZAG].reshape(64, 1)
    )
    corr = jnp.asarray(
        np.asarray(table.corrections)[ZIGZAG].reshape(64, 1)
    )
    out = _build(n_tiles)(x, recip, corr)
    return out[:, :B]


def fdct_quantize_pallas(blocks, table: QuantizationTable):
    """Fused transform for a batch of level-shifted blocks.

    ``blocks``: int32 (..., 64) natural-order samples minus 128.
    Returns int16 (..., 64) zigzag-ordered quantized coefficients,
    bit-exact with the XLA path.
    """
    shape = blocks.shape
    flat = blocks.reshape(-1, 64).astype(jnp.int32)
    B = flat.shape[0]
    n_tiles = -(-B // _TILE_B)
    padded = n_tiles * _TILE_B
    if padded != B:
        flat = jnp.pad(flat, ((0, padded - B), (0, 0)))

    x = flat.T  # (64, padded): coefficient-major, block lanes
    recip = jnp.asarray(
        np.asarray(table.reciprocals)[ZIGZAG].reshape(64, 1)
    )
    corr = jnp.asarray(
        np.asarray(table.corrections)[ZIGZAG].reshape(64, 1)
    )
    out = _build(n_tiles)(x, recip, corr)
    return out.T[:B].reshape(shape).astype(jnp.int16)
