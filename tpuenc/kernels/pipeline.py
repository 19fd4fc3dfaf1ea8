"""Device pipeline: pixels -> quantized zigzag coefficient blocks.

This is the TPU-side spine of the encoder.  One jit-compiled function per
(image shape, color type, config) performs:

    interleaved bytes -> color convert -> edge-replicated pad to MCU grid
      -> per-component point subsample -> 8x8 blockify (-128 level shift)
      -> batched fDCT -> fused zigzag+quantize -> int16 blocks in scan order

replacing the reference's per-scanline/per-block hot loops
(``/root/reference/src/encoder.rs:699-807`` interleaved and
``encoder.rs:977-1056`` full-image ``encode_blocks``) with whole-image
batched tensor ops.  Semantics preserved exactly:

* Edge replication of the last row/column to the sampling-aligned size
  (encoder.rs:738-744, 1003-1010) — replicate, never zero-pad.
* Chroma subsampling by point sampling with stride max/comp
  (encoder.rs:1222-1242), level shift fused.
* Interleaved scan order: MCU raster, then component, then v then h offset
  (encoder.rs:759-769).
* Sequential/progressive block grids per component are
  ceil(ceil(dim/8)/scale) (encoder.rs:1012-1025) — one block narrower than
  the MCU-padded grid when the image width is just past a block boundary.

Everything inside :func:`coefficients_fn` is traced once per static
(shape, config) and runs fully on device.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.tables import quantization_table
from ..core.types import (
    ColorType,
    EncoderConfig,
    init_components,
    max_sampling,
)
from .color_convert import to_planes
from .fdct import fdct_blocks
from .quantize import quantize_zigzag


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _blockify(plane):
    """(H, W) -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape[-2:]
    x = plane.reshape(*plane.shape[:-2], h // 8, 8, w // 8, 8)
    return jnp.swapaxes(x, -3, -2)


def _pad_edge(plane, target_h: int, target_w: int):
    h, w = plane.shape[-2:]
    pad = [(0, 0)] * (plane.ndim - 2) + [(0, target_h - h), (0, target_w - w)]
    return jnp.pad(plane, pad, mode="edge")


def _component_blocks(plane, v_scale: int, h_scale: int):
    """Point-subsample, level shift and blockify one padded component plane."""
    sub = plane[..., ::v_scale, ::h_scale] - 128
    return _blockify(sub)


def _blockify_cm(plane, v_scale: int, h_scale: int):
    """Point-subsample, level shift and blockify one padded component plane
    straight into coefficient-major layout: (..., H, W) -> (64, L) with
    sample index ``y*8+x`` on sublanes and raster block index on lanes
    (leading batch dims fold into the lane order as (n, r, c)).

    This formulation — stride-8 lane slices stacked then transposed —
    lowers ~40x faster on TPU than the naive
    ``reshape/swapaxes/reshape/T`` chain (0.13 ms vs 5.6 ms per 3.6 MP
    plane, measured), which round 1 used and which dominated the whole
    coefficient stage.

    Point subsampling is folded INTO the gather rather than materialized
    first: a ``plane[::2, ::2]`` strided slice lowers pathologically on
    TPU (~23 ms per 4K chroma plane — it made the whole 4:2:0
    coefficient stage 34x slower than 4:4:4, measured).  Selecting rows
    by a sublane-axis reshape-index and columns by stride ``8*h_scale``
    lane slices keeps the same ~0.1 ms/plane cost as the unsampled path.
    """
    h, w = plane.shape[-2:]
    if plane.ndim == 3:  # batch: stack images vertically (lane order n,r,c)
        plane = plane.reshape(-1, w)
        h = plane.shape[0]
    # Rows of block-row r: plane rows r*8v + j*v (j = 0..7).
    x = plane.reshape(h // (8 * v_scale), 8, v_scale, w)[:, :, 0, :] - 128
    # Cols of block-col c, offset i: plane col (8c + i) * h_scale.
    cols = [
        x[:, :, i * h_scale :: 8 * h_scale] for i in range(8)
    ]  # each (R, 8, C)
    s = jnp.stack(cols, axis=2)  # (R, 8, 8, C) = (r, y, x, c)
    return s.transpose(1, 2, 0, 3).reshape(64, -1)


def _use_pallas_fdct() -> bool:
    """The fused Mosaic fDCT+zigzag+quantize kernel is the default on real
    TPU (measured 0.23 ms vs 6.2 ms for the XLA lowering on a 3.6 MP
    plane batch, bit-exact); elsewhere the XLA path avoids Pallas
    interpret-mode overhead.  TPUENC_PALLAS_FDCT=0|1 overrides."""
    import os

    flag = os.environ.get("TPUENC_PALLAS_FDCT", "auto")
    if flag in ("0", "1"):
        return flag == "1"
    return jax.default_backend() == "tpu"


def _build_coefficients_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    batched: bool,
):
    """Build + jit the pixels->coefficients function for a static shape/config.

    Returns ``(fn, layout)`` where ``layout`` describes the produced block
    streams (see :func:`scan_layout`).
    """
    return _build_coefficients_fn_impl(
        width, height, color_type, config, batched, _use_pallas_fdct()
    )


@lru_cache(maxsize=64)
def _build_coefficients_fn_impl(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    batched: bool,
    use_pallas: bool,
):
    jct = color_type.jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    interleaved = config.mode() == "interleaved"

    num_cols = _cdiv(width, 8 * max_h)
    num_rows = _cdiv(height, 8 * max_v)
    pad_w = num_cols * 8 * max_h
    pad_h = num_rows * 8 * max_v

    q_tables = [
        quantization_table(config.quantization[0], config.quality, luma=True),
        quantization_table(config.quantization[1], config.quality, luma=False),
    ]

    def _planes(px):
        # Batched grayscale arrives as (N, H, W) with NO channel axis;
        # to_planes would strip the last axis as channels (the W column
        # of every image), silently corrupting batched LUMA encodes
        # (caught by the encode_batch fuzz on 1x1 images, where the
        # mangled shapes still traced).
        if color_type is ColorType.LUMA and batched:
            return (px.astype(jnp.int32),)
        return to_planes(px, color_type)

    def fn(pixels):
        px = pixels
        planes = _planes(px)
        out = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            plane = _pad_edge(planes[comp.id], pad_h, pad_w)
            blocks = _component_blocks(plane, v_scale, h_scale)
            if use_pallas:
                from .pallas_fdct import fdct_quantize_pallas

                flat = blocks.reshape(*blocks.shape[:-2], 64)
                qz = fdct_quantize_pallas(
                    flat, q_tables[comp.quantization_table]
                )
            else:
                dct = fdct_blocks(blocks)
                flat = dct.reshape(*dct.shape[:-2], 64)
                qz = quantize_zigzag(flat, q_tables[comp.quantization_table])
            out.append(qz)  # (..., R, C, 64) int16

        if interleaved:
            # MCU scan order: (MCU, component-major blocks within MCU, 64).
            streams = []
            for comp, qz in zip(components, out):
                cv = comp.vertical_sampling_factor
                ch = comp.horizontal_sampling_factor
                lead = qz.shape[:-3]
                x = qz.reshape(*lead, num_rows, cv, num_cols, ch, 64)
                x = jnp.moveaxis(x, -4, -3)  # -> (rows, cols, cv, ch, 64)
                streams.append(x.reshape(*lead, num_rows * num_cols, cv * ch, 64))
            mcu = jnp.concatenate(streams, axis=-2)
            lead = mcu.shape[:-3]
            return (mcu.reshape(*lead, -1, 64),)

        # Sequential / progressive: per-component raster grids.
        results = []
        for comp, qz in zip(components, out):
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            cols = _cdiv(_cdiv(width, 8), h_scale)
            rows = _cdiv(_cdiv(height, 8), v_scale)
            lead = qz.shape[:-3]
            sliced = qz[..., :rows, :cols, :]
            results.append(sliced.reshape(*lead, rows * cols, 64))
        return tuple(results)

    def fn_cm(pixels):
        """Coefficient-major twin of ``fn``: returns per-scan streams as
        (64, L) arrays (lane order = block scan order; for batched input
        images concatenate along lanes).  Only built on the Pallas path —
        it exists to keep the whole device pipeline in the (64, lanes)
        layout the fDCT and entropy-pack kernels natively use, eliding
        every blockify/MCU-order transpose XLA lowers poorly."""
        from .pallas_fdct import fdct_quantize_pallas_cm

        planes = _planes(pixels)
        out = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            plane = _pad_edge(planes[comp.id], pad_h, pad_w)
            x_cm = _blockify_cm(plane, v_scale, h_scale)
            out.append(
                fdct_quantize_pallas_cm(x_cm, q_tables[comp.quantization_table])
            )

        if interleaved:
            # Lane permutation raster -> MCU order: factor lanes as
            # (n, rows, cv, cols, ch) and swap (cv, cols).
            streams = []
            for comp, x in zip(components, out):
                cv = comp.vertical_sampling_factor
                ch = comp.horizontal_sampling_factor
                if cv > 1 or ch > 1:
                    x = x.reshape(64, -1, num_rows, cv, num_cols, ch)
                    x = x.transpose(0, 1, 2, 4, 3, 5)
                streams.append(x.reshape(64, -1, num_rows * num_cols, cv * ch))
            mcu = jnp.concatenate(streams, axis=-1)
            return (mcu.reshape(64, -1),)

        results = []
        for comp, x in zip(components, out):
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            cols = _cdiv(_cdiv(width, 8), h_scale)
            rows = _cdiv(_cdiv(height, 8), v_scale)
            grid_r = pad_h // (8 * v_scale)
            grid_c = pad_w // (8 * h_scale)
            x = x.reshape(64, -1, grid_r, grid_c)[:, :, :rows, :cols]
            results.append(x.reshape(64, -1))
        return tuple(results)

    def fn_cm_samples(pixels):
        """MCU-ordered LEVEL-SHIFTED SAMPLE stream, (64, B) int16 — the
        input of the fused sample->pack kernel
        (``pallas_pack.fused_sample_pack_blocks``), which runs fDCT +
        quantize + DC-diff + P1 in one Mosaic pass so the coefficient
        stream never exists in HBM.  Same blockify + MCU lane
        permutation as ``fn_cm``, minus the transform."""
        planes = _planes(pixels)
        out = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            plane = _pad_edge(planes[comp.id], pad_h, pad_w)
            out.append(
                _blockify_cm(plane, v_scale, h_scale).astype(jnp.int16)
            )
        streams = []
        for comp, x in zip(components, out):
            cv = comp.vertical_sampling_factor
            ch = comp.horizontal_sampling_factor
            if cv > 1 or ch > 1:
                x = x.reshape(64, -1, num_rows, cv, num_cols, ch)
                x = x.transpose(0, 1, 2, 4, 3, 5)
            streams.append(x.reshape(64, -1, num_rows * num_cols, cv * ch))
        mcu = jnp.concatenate(streams, axis=-1)
        return mcu.reshape(64, -1)

    jitted = jax.jit(fn)
    jitted.raw_fn = fn  # untraced body, reused by the fused device-encode path
    jitted.raw_fn_cm = fn_cm if use_pallas else None
    jitted.raw_fn_cm_samples = (
        fn_cm_samples if (use_pallas and interleaved) else None
    )
    return jitted, scan_layout(width, height, color_type, config)


def scan_layout(width: int, height: int, color_type: ColorType, config: EncoderConfig):
    """Static description of the block streams produced by the pipeline.

    Returns a dict with:
      components       — tuple[Component]
      interleaved      — bool
      mcu_count        — number of MCUs (interleaved only)
      mcu_block_comps  — per-block-in-MCU component index (interleaved only)
      comp_block_counts— per-component block counts (sequential/progressive)
    """
    jct = color_type.jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    interleaved = config.mode() == "interleaved"

    layout = {
        "components": components,
        "interleaved": interleaved,
        "max_h": max_h,
        "max_v": max_v,
    }
    if interleaved:
        num_cols = _cdiv(width, 8 * max_h)
        num_rows = _cdiv(height, 8 * max_v)
        blocks_per_mcu = []
        for idx, comp in enumerate(components):
            blocks_per_mcu += [idx] * (
                comp.vertical_sampling_factor * comp.horizontal_sampling_factor
            )
        layout["mcu_count"] = num_rows * num_cols
        layout["mcu_block_comps"] = tuple(blocks_per_mcu)
    else:
        counts = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            cols = _cdiv(_cdiv(width, 8), h_scale)
            rows = _cdiv(_cdiv(height, 8), v_scale)
            counts.append(rows * cols)
        layout["comp_block_counts"] = tuple(counts)
    return layout


def coefficients_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    batched: bool = False,
):
    """Public entry: jitted pixels->blocks function plus its scan layout."""
    return _build_coefficients_fn(width, height, ColorType(color_type), config, batched)
