"""One-off attribution of the coefficients stage (pixels -> int16 blocks).

Times each sub-stage of tpuenc.kernels.pipeline's coefficient function in
isolation on the real chip, using the slope-timing trick from bench.py.
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
from tpuenc.kernels.pipeline import _blockify, _component_blocks, _pad_edge, _cdiv
from tpuenc.kernels.pallas_fdct import fdct_quantize_pallas

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
q_tables = [
    quantization_table(config.quantization[0], config.quality, luma=True),
    quantization_table(config.quantization[1], config.quality, luma=False),
]


def timeit(name, fn, *args):
    j = jax.jit(fn)
    j(*args)
    ms = _amortized_ms(lambda: j(*args))
    print(f"{name:44s} {ms:8.3f} ms")
    return j


# a: color convert only
timeit("to_planes", lambda px: sum(p.sum() for p in to_planes(px, ColorType.RGB)), dimg)


# b: + pad + subsample + blockify + flatten (the layout work)
def upto_blocks(px):
    planes = to_planes(px, ColorType.RGB)
    acc = jnp.int32(0)
    for comp in components:
        plane = _pad_edge(planes[comp.id], pad_h, pad_w)
        blocks = _component_blocks(plane, 1, 1)
        flat = blocks.reshape(*blocks.shape[:-2], 64)
        acc = acc + flat.astype(jnp.int32).sum()
    return acc


timeit("to_planes + pad + blockify(flat)", upto_blocks, dimg)


# c: + pallas fdct/quantize
def upto_fdct(px):
    planes = to_planes(px, ColorType.RGB)
    acc = jnp.int32(0)
    for comp in components:
        plane = _pad_edge(planes[comp.id], pad_h, pad_w)
        blocks = _component_blocks(plane, 1, 1)
        flat = blocks.reshape(*blocks.shape[:-2], 64)
        qz = fdct_quantize_pallas(flat, q_tables[comp.quantization_table])
        acc = acc + qz.astype(jnp.int32).sum()
    return acc


timeit("+ pallas fdct_quantize", upto_fdct, dimg)


# d: full, with MCU reorder (the real fn)
def full(px):
    planes = to_planes(px, ColorType.RGB)
    out = []
    for comp in components:
        plane = _pad_edge(planes[comp.id], pad_h, pad_w)
        blocks = _component_blocks(plane, 1, 1)
        flat = blocks.reshape(*blocks.shape[:-2], 64)
        qz = fdct_quantize_pallas(flat, q_tables[comp.quantization_table])
        out.append(qz)
    streams = []
    for comp, qz in zip(components, out):
        x = qz.reshape(num_rows, 1, num_cols, 1, 64)
        x = jnp.moveaxis(x, -4, -3)
        streams.append(x.reshape(num_rows * num_cols, 1, 64))
    mcu = jnp.concatenate(streams, axis=-2)
    return mcu.reshape(-1, 64).astype(jnp.int32).sum()


timeit("full (with MCU reorder)", full, dimg)


# e: pallas kernel alone on pre-laid-out input
flatin = jax.device_put(
    np.random.default_rng(0).integers(-128, 128, (num_rows * 8 // 8, num_cols * 8 // 8, 64)).astype(np.int16)
)
timeit(
    "pallas fdct_quantize alone (1 plane)",
    lambda b: fdct_quantize_pallas(b, q_tables[0]).astype(jnp.int32).sum(),
    flatin,
)
