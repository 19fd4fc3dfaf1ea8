"""Composed experiment: coefficient-major pipeline end-to-end.

Builds pixels -> (64, 3B) interleaved quantized coefficients entirely in
coefficient-major layout using candidate blockify formulations, checks
bit-exactness vs the current pipeline, and times the whole stage.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _amortized_ms, make_rgb
from tpuenc.core.tables import quantization_table
from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor, init_components, max_sampling
from tpuenc.kernels.color_convert import to_planes
from tpuenc.kernels.pipeline import coefficients_fn, _cdiv, _pad_edge
from tpuenc.kernels import pallas_fdct as pf

W, H = 2000, 1800
img = make_rgb(W, H)
dimg = jax.device_put(img)

config = EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_1_1)
components = init_components(ColorType.RGB.jpeg_color_type, config.sampling_factor)
max_h, max_v = max_sampling(components)
num_cols = _cdiv(W, 8 * max_h)
num_rows = _cdiv(H, 8 * max_v)
pad_w = num_cols * 8 * max_h
pad_h = num_rows * 8 * max_v
R, C = pad_h // 8, pad_w // 8
B = R * C
q_tables = [
    quantization_table(config.quantization[0], config.quality, luma=True),
    quantization_table(config.quantization[1], config.quality, luma=False),
]

# Current pipeline output (reference)
cur_fn, layout = coefficients_fn(W, H, ColorType.RGB, config)
ref = np.asarray(cur_fn(dimg)[0])  # (3B, 64)


def cm_kernel_call(x_cm, table):
    """fdct_quantize on pre-transposed (64, Bp) input (no .T round trips)."""
    Bq = x_cm.shape[1]
    n_tiles = -(-Bq // pf._TILE_B)
    padded = n_tiles * pf._TILE_B
    if padded != Bq:
        x_cm = jnp.pad(x_cm, ((0, 0), (0, padded - Bq)))
    from tpuenc.core.tables import ZIGZAG

    recip = jnp.asarray(np.asarray(table.reciprocals)[ZIGZAG].reshape(64, 1))
    corr = jnp.asarray(np.asarray(table.corrections)[ZIGZAG].reshape(64, 1))
    out = pf._build(n_tiles)(x_cm.astype(jnp.int32), recip, corr)
    return out[:, :Bq]


def blockify_cm_rowsfirst(plane):
    x = (plane - 128).astype(jnp.int32)
    x = x.reshape(R, 8, pad_w)
    x = x.transpose(1, 0, 2).reshape(8, R, C, 8)
    x = jnp.moveaxis(x, 3, 1)
    return x.reshape(64, B)


def blockify_cm_gather(plane):
    x = (plane - 128).astype(jnp.int32)
    x = x.reshape(R, 8, pad_w)
    cols = [x[:, :, i::8] for i in range(8)]
    s = jnp.stack(cols, axis=2)  # (R, 8, 8, C)
    return s.transpose(1, 2, 0, 3).reshape(64, B)


def make_full(blockify):
    def full(px):
        planes = to_planes(px, ColorType.RGB)
        outs = []
        for comp in components:
            plane = _pad_edge(planes[comp.id], pad_h, pad_w)
            x_cm = blockify(plane)
            outs.append(cm_kernel_call(x_cm, q_tables[comp.quantization_table]))
        # interleave components along lanes: (64, B, ncomp) -> (64, ncomp*B)
        s = jnp.stack(outs, axis=-1)
        return s.reshape(64, B * len(outs))

    return full


def run(name, blockify):
    j = jax.jit(make_full(blockify))
    out = np.asarray(j(dimg))  # (64, 3B)
    np.testing.assert_array_equal(out.T, ref)
    ms = _amortized_ms(lambda: j(dimg))
    print(f"{name:44s} {ms:8.3f} ms")


print("checking vs current pipeline output...")
run("cm rows-first", blockify_cm_rowsfirst)
run("cm lane-gather", blockify_cm_gather)

# and the current pipeline for comparison
cf = jax.jit(lambda px: sum(s.astype(jnp.int32).sum() for s in cur_fn.raw_fn(px)))
cf(dimg)
print(f"{'current pipeline (sum-reduced)':44s} {_amortized_ms(lambda: cf(dimg)):8.3f} ms")
