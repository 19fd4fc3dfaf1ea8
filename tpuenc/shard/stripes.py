"""MCU-row-stripe sharding of the encode pipeline.

The TPU scaling story for a single large image (SURVEY §5 "long context"
analog): the MCU-row grid is partitioned into contiguous stripes, one per
device along the ``stripe`` mesh axis, while a ``batch`` axis data-parallels
whole images.  Because every block's DCT/quantize is independent and the
entropy stream is assembled per MCU-row raster, stripes need **no halo
exchange**; the only cross-device traffic is:

* ``psum`` of Huffman symbol histograms (two-pass optimized tables), and
* a ``ppermute`` shift of each stripe's final DC coefficients so the DC
  differential chain stays exact across stripe boundaries.

The local computation is the same batched pipeline as the single-chip path
(``kernels.pipeline``), run under ``shard_map`` so partitioning is explicit
and XLA inserts no surprise collectives.

Stripe alignment: each stripe owns ``rows_per_stripe`` MCU rows; the image
is edge-padded (replicating the last real row, reference semantics
encoder.rs:738-744) up to ``n_stripes * rows_per_stripe`` MCU rows, and the
host entropy assembly drops blocks from padding MCU rows.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.tables import quantization_table
from ..core.types import ColorType, EncoderConfig, init_components, max_sampling
from ..kernels.color_convert import to_planes
from ..kernels.fdct import fdct_blocks
from ..kernels.pipeline import _blockify, _cdiv
from ..kernels.quantize import quantize_zigzag


def stripe_geometry(width: int, height: int, color_type: ColorType,
                    config: EncoderConfig, n_stripes: int):
    """Static geometry of the striped layout."""
    jct = ColorType(color_type).jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    num_cols = _cdiv(width, 8 * max_h)
    num_rows = _cdiv(height, 8 * max_v)
    rows_per_stripe = _cdiv(num_rows, n_stripes)
    return {
        "components": components,
        "max_h": max_h,
        "max_v": max_v,
        "num_cols": num_cols,
        "num_rows": num_rows,
        "rows_per_stripe": rows_per_stripe,
        "pad_h": n_stripes * rows_per_stripe * 8 * max_v,
        "pad_w": num_cols * 8 * max_h,
    }


def pad_for_stripes(pixels: np.ndarray, geo, channels: bool | None = None
                    ) -> np.ndarray:
    """Host-side edge-replicating pad of (..., H, W[, C]) pixels to the
    stripe-aligned canvas.

    ``channels`` says whether the trailing axis is a channel axis.  A
    3-D array is ambiguous — (H, W, C) vs a batched luma (B, H, W) — so
    batched-luma callers must pass ``channels=False``; the default
    preserves the historical channel-last reading for ndim >= 3."""
    if channels is None:
        channels = pixels.ndim >= 3
    spatial_offset = pixels.ndim - (3 if channels else 2)
    pad = [(0, 0)] * pixels.ndim
    pad[spatial_offset] = (0, geo["pad_h"] - pixels.shape[spatial_offset])
    pad[spatial_offset + 1] = (0, geo["pad_w"] - pixels.shape[spatial_offset + 1])
    return np.pad(pixels, pad, mode="edge")


@lru_cache(maxsize=32)
def _build_stripe_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    mesh: Mesh,
    with_histograms: bool,
):
    n_stripes = mesh.shape["stripe"]
    geo = stripe_geometry(width, height, color_type, config, n_stripes)
    components = geo["components"]
    max_h, max_v = geo["max_h"], geo["max_v"]
    num_cols = geo["num_cols"]
    rows_local = geo["rows_per_stripe"]
    interleaved = config.mode() == "interleaved"

    q_tables = [
        quantization_table(config.quantization[0], config.quality, luma=True),
        quantization_table(config.quantization[1], config.quality, luma=False),
    ]

    def local_fn(px):
        # px: (B_local, rows_local*8*max_v, pad_w, C) — one stripe of each
        # local image.  Same math as kernels.pipeline but with no padding
        # (the canvas is pre-padded) and stripe-local row counts.
        planes = to_planes(px, color_type)
        out = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            sub = planes[comp.id][..., ::v_scale, ::h_scale] - 128
            blocks = _blockify(sub)
            dct = fdct_blocks(blocks)
            qz = quantize_zigzag(
                dct.reshape(*dct.shape[:-2], 64),
                q_tables[comp.quantization_table],
            )
            out.append(qz)

        if interleaved:
            streams = []
            for comp, qz in zip(components, out):
                cv = comp.vertical_sampling_factor
                ch = comp.horizontal_sampling_factor
                lead = qz.shape[:-3]
                x = qz.reshape(*lead, rows_local, cv, num_cols, ch, 64)
                x = jnp.moveaxis(x, -4, -3)
                streams.append(x.reshape(*lead, rows_local * num_cols, cv * ch, 64))
            mcu = jnp.concatenate(streams, axis=-2)
            lead = mcu.shape[:-3]
            coeff = (mcu.reshape(*lead, -1, 64),)
        else:
            coeff = tuple(
                qz.reshape(*qz.shape[:-3], -1, 64) for qz in out
            )

        if not with_histograms:
            return coeff

        # Per-stripe, PER-IMAGE histograms; DC chains are made
        # boundary-exact by shifting each image's last stripe-local DC to
        # its right neighbor via ppermute before differencing.  Keeping the
        # local batch axis separate matches the serial semantics (the host
        # histograms one image at a time — chaining DC differentials across
        # images would skew the table statistics).
        comp_streams = coeff if not interleaved else tuple(
            qz.reshape(*qz.shape[:-3], -1, 64) for qz in out
        )
        # Stripe-alignment padding MCU rows (global tail only) must not
        # contribute symbols: the serial encoder never sees them.
        stripe_idx = jax.lax.axis_index("stripe")
        num_rows = geo["num_rows"]
        fixed = []
        perm = [(i, i + 1) for i in range(n_stripes - 1)]
        for comp, stream in zip(components, comp_streams):
            n_blocks = stream.shape[-2]
            per_mcu_row = n_blocks // rows_local
            mcu_row = (
                jnp.arange(n_blocks, dtype=jnp.int32) // per_mcu_row
            )
            valid = (stripe_idx * rows_local + mcu_row) < num_rows
            # (B_local, blocks, 64)
            last_dc = stream[:, -1, 0].astype(jnp.int32)   # (B_local,)
            prev0 = jax.lax.ppermute(last_dc, "stripe", perm)
            fixed.append((stream, prev0, valid))

        hists = _histograms_with_boundary(fixed, components, config)
        # Reduce over stripes only: histograms stay per-image so the host
        # builds each image's own optimized tables (reference semantics).
        hists = jax.tree.map(
            lambda h: jax.lax.psum(h, "stripe"), hists
        )
        return coeff, hists

    def _histograms_with_boundary(fixed, components, config):
        from ..entropy.device import ac_histogram, bit_length
        from ..entropy.huffopt import progressive_bands

        max_tables = min(len(components), 2)
        out = []
        for table in range(max_tables):
            b_local = fixed[0][0].shape[0]
            dc = jnp.zeros((b_local, 257), dtype=jnp.int32)
            ac = jnp.zeros((b_local, 257), dtype=jnp.int32)
            bins257 = jnp.arange(257, dtype=jnp.int32)
            ac_hist_b = jax.vmap(ac_histogram, in_axes=(0, None, None, None))
            for comp, (stream, prev0, valid) in zip(components, fixed):
                if comp.dc_huffman_table == table:
                    dcv = stream[:, :, 0].astype(jnp.int32)
                    prev = jnp.concatenate(
                        [prev0[:, None], dcv[:, :-1]], axis=1
                    )
                    sizes = bit_length(dcv - prev)
                    # Masked bincount via compare-reduce (TPU scatter-adds
                    # serialize; see entropy.device._bincount_small).
                    eq = (sizes[:, :, None] == bins257) & valid[None, :, None]
                    dc = dc + jnp.sum(eq.astype(jnp.int32), axis=1)
                if comp.ac_huffman_table == table:
                    if config.progressive_scans is not None:
                        for s, e in progressive_bands(config.progressive_scans):
                            ac = ac + ac_hist_b(stream, s, e, valid)
                    else:
                        ac = ac + ac_hist_b(stream, 1, 64, valid)
            out.append((dc, ac))
        return tuple(out)

    in_spec = P("batch", "stripe", None, None)
    if ColorType(color_type) is ColorType.LUMA:
        in_spec = P("batch", "stripe", None)
    coeff_spec = P("batch", "stripe", None)

    if with_histograms:
        ncomp = len(components)
        n_streams = 1 if interleaved else ncomp
        hist_spec = P("batch", None)  # per-image (B, 257) histograms
        out_specs = (
            tuple([coeff_spec] * n_streams),
            tuple([(hist_spec, hist_spec)] * min(ncomp, 2)),
        )
    else:
        n_streams = 1 if interleaved else len(components)
        out_specs = tuple([coeff_spec] * n_streams)

    fn = shard_map(local_fn, mesh=mesh, in_specs=(in_spec,), out_specs=out_specs)
    return jax.jit(fn), geo


def stripe_encode_step(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    mesh: Mesh,
    with_histograms: bool = False,
):
    """Jitted sharded pixels->coefficients (+psum histograms) step.

    The returned function takes pixels of shape (B, pad_h, pad_w, C) (use
    :func:`pad_for_stripes`; B divisible by the ``batch`` axis) and returns
    per-stream int16 coefficient arrays whose block axis is ordered
    stripe-major — i.e. the global MCU-row raster order.
    """
    return _build_stripe_fn(
        width, height, ColorType(color_type), config, mesh, with_histograms
    )


@lru_cache(maxsize=16)
def _build_general_pack_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    mesh: Mesh,
    budget: int,
):
    """Generalized fully-sharded entropy pack: every stripe packs its
    portion of EVERY scan (interleaved, sequential or progressive; any
    restart interval or none) as a raw bitstream on its device.

    Mid-stream correctness comes from the same primitives as the chunked
    path (``entropy.chunked``): DC predictor tails cross stripe
    boundaries via ``ppermute``, restart-segment geometry uses the global
    block offset, and trailing stripe-alignment padding blocks are masked
    to zero bits.  The host bit-concatenates the per-stripe streams and
    realigns/stuffs each restart segment once (native packer) — only
    compressed bits and per-block bit counts leave the devices.

    Requires MCU-aligned dimensions (component scan grids must coincide
    with the stripe grids).  Returns (jit_fn, geo, plan, per-scan local
    block counts); the function maps ((B, pad_h, pad_w, C) pixels,
    dc_packed, ac_packed) to a tuple of (stream, bits, lens) triples per
    scan, each sharded (batch, stripe)-major.
    """
    from ..entropy.device_encode import build_scan_plan
    from ..entropy.pallas_pack import dc_diffs_for_spec, device_scan_pack
    from ..kernels.pipeline import scan_layout

    n_stripes = mesh.shape["stripe"]
    geo = stripe_geometry(width, height, color_type, config, n_stripes)
    components = geo["components"]
    max_h, max_v = geo["max_h"], geo["max_v"]
    num_cols = geo["num_cols"]
    num_rows = geo["num_rows"]
    rows_local = geo["rows_per_stripe"]
    assert width % (8 * max_h) == 0 and height % (8 * max_v) == 0

    layout = scan_layout(width, height, color_type, config)
    plan = build_scan_plan(layout, components, config)
    interleaved = layout["interleaved"]

    q_tables = [
        quantization_table(config.quantization[0], config.quality, luma=True),
        quantization_table(config.quantization[1], config.quality, luma=False),
    ]
    # Decide interpret from the MESH's devices, not the process default
    # backend: a CPU dryrun mesh in a process whose default backend is
    # still a TPU (the axon plugin ignores JAX_PLATFORMS once initialized)
    # must run the Mosaic kernels in interpret mode.
    interpret = mesh.devices.flat[0].platform != "tpu"
    perm = [(i, i + 1) for i in range(n_stripes - 1)]

    # Per-scan local block geometry (static).
    local_counts = []
    for stream_idx, spec, _ in plan:
        if interleaved:
            bpm = len(layout["mcu_block_comps"])
            local_counts.append(rows_local * num_cols * bpm)
        else:
            comp = components[stream_idx]
            cv = comp.vertical_sampling_factor
            ch = comp.horizontal_sampling_factor
            local_counts.append(rows_local * cv * num_cols * ch)

    def local_fn(px, dc_packed, ac_packed):
        px = px[0]                # B_local == 1
        dc_packed = dc_packed[0]  # per-image tables, batch-sharded
        ac_packed = ac_packed[0]
        planes = to_planes(px, color_type)
        grids = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            sub = planes[comp.id][..., ::v_scale, ::h_scale] - 128
            blocks = _blockify(sub)
            dct = fdct_blocks(blocks)
            qz = quantize_zigzag(
                dct.reshape(*dct.shape[:-2], 64),
                q_tables[comp.quantization_table],
            )
            grids.append(qz)

        if interleaved:
            streams_mcu = []
            for comp, qz in zip(components, grids):
                cv = comp.vertical_sampling_factor
                ch = comp.horizontal_sampling_factor
                x = qz.reshape(rows_local, cv, num_cols, ch, 64)
                x = jnp.moveaxis(x, 1, 2)
                streams_mcu.append(
                    x.reshape(rows_local * num_cols, cv * ch, 64)
                )
            mcu = jnp.concatenate(streams_mcu, axis=-2)
            comp_streams = (mcu.reshape(-1, 64),)
        else:
            comp_streams = tuple(qz.reshape(-1, 64) for qz in grids)

        sidx = jax.lax.axis_index("stripe")
        valid_rows = jnp.clip(num_rows - sidx * rows_local, 0, rows_local)

        outs = []
        for (stream_idx, spec, _), n_local in zip(plan, local_counts):
            blocks_local = comp_streams[stream_idx].astype(jnp.int32)
            pat = len(spec.dc_tab_pattern)
            per_row = n_local // rows_local
            valid_blocks = valid_rows * per_row
            go = sidx * n_local

            if spec.emit_dc:
                tail_dc = blocks_local[-pat:, 0].astype(jnp.int32)
                prev_tail = jax.lax.ppermute(tail_dc, "stripe", perm)
                dcdiff = dc_diffs_for_spec(
                    blocks_local, spec, prev_tail=prev_tail,
                    global_offset=go,
                )
            else:
                dcdiff = jnp.zeros((n_local,), jnp.int32)

            stream, bits, lens, ovf = device_scan_pack(
                blocks_local, spec, dc_packed, ac_packed, budget,
                interpret=interpret, dcdiff=dcdiff,
                valid_blocks=valid_blocks,
            )
            meta = jnp.stack(
                [ovf.astype(jnp.int32), bits.astype(jnp.int32)]
            )
            outs.append(
                (stream[None, None], meta[None, None],
                 lens[:n_local][None, None])
            )
        return tuple(outs)

    in_spec = P("batch", "stripe", None, None)
    if ColorType(color_type) is ColorType.LUMA:
        in_spec = P("batch", "stripe", None)
    triple = (
        P("batch", "stripe", None),
        P("batch", "stripe", None),
        P("batch", "stripe", None),
    )
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            in_spec, P("batch", None, None), P("batch", None, None),
        ),
        out_specs=tuple(triple for _ in plan),
        # The Pallas packer's out_shapes carry no vma annotations; skip
        # the varying-axis check (outputs are per-shard by construction).
        check_vma=False,
    )
    return jax.jit(fn), geo, plan, tuple(local_counts)


@lru_cache(maxsize=16)
def _build_stripe_pack_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    mesh: Mesh,
    budget: int,
):
    """Fully sharded interleaved encode: each stripe packs its own MCU rows
    into a byte-aligned bitstream **on its device** — the SURVEY §2 design
    where restart segments are the parallelism seam and only per-segment
    byte lengths leave the devices.

    Requires interleaved mode with a restart interval that divides each
    stripe's MCU count, so stripe boundaries coincide with (byte-aligned,
    DC-reset) restart boundaries and host assembly is pure concatenation
    with RST markers.  Returns (jit_fn, geo, scan_spec): the function maps
    (B, pad_h, pad_w, C) pixels to per-stripe (bytes, meta) arrays sharded
    over the mesh.
    """
    from ..entropy.device_encode import build_scan_plan
    from ..entropy.device_pack import scan_pack, words_to_bytes
    from ..kernels.pipeline import scan_layout

    n_stripes = mesh.shape["stripe"]
    geo = stripe_geometry(width, height, color_type, config, n_stripes)
    components = geo["components"]
    max_h, max_v = geo["max_h"], geo["max_v"]
    num_cols = geo["num_cols"]
    rows_local = geo["rows_per_stripe"]
    assert config.mode() == "interleaved", "sharded pack is interleaved-only"
    assert config.restart_interval, "sharded pack needs a restart interval"

    layout = scan_layout(width, height, color_type, config)
    plan = build_scan_plan(layout, components, config)
    (_, spec, _), = plan
    bpm = len(layout["mcu_block_comps"])
    mcus_local = rows_local * num_cols
    assert mcus_local % config.restart_interval == 0, (
        f"restart interval {config.restart_interval} must divide the "
        f"stripe MCU count {mcus_local}"
    )

    q_tables = [
        quantization_table(config.quantization[0], config.quality, luma=True),
        quantization_table(config.quantization[1], config.quality, luma=False),
    ]

    def local_fn(px, dc_sizes, dc_codes, ac_sizes, ac_codes):
        planes = to_planes(px, color_type)
        streams = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            sub = planes[comp.id][..., ::v_scale, ::h_scale] - 128
            blocks = _blockify(sub)
            from ..kernels.fdct import fdct_blocks as _fdct

            dct = _fdct(blocks)
            qz = quantize_zigzag(
                dct.reshape(*dct.shape[:-2], 64),
                q_tables[comp.quantization_table],
            )
            cv = comp.vertical_sampling_factor
            ch = comp.horizontal_sampling_factor
            lead = qz.shape[:-3]
            x = qz.reshape(*lead, rows_local, cv, num_cols, ch, 64)
            x = jnp.moveaxis(x, -4, -3)
            streams.append(x.reshape(*lead, rows_local * num_cols, cv * ch, 64))
        mcu = jnp.concatenate(streams, axis=-2)
        blocks_flat = mcu.reshape(-1, 64)  # local batch folded in

        words, bits, seg_bits, ovf = scan_pack(
            blocks_flat, spec, dc_sizes, dc_codes, ac_sizes, ac_codes, budget
        )
        data = words_to_bytes(words)
        meta = jnp.concatenate(
            [ovf.astype(jnp.int32)[None], bits[None], seg_bits]
        )
        # Keep per-stripe outputs sharded; one leading axis per mesh dim so
        # out_specs can lay them out without collectives.
        return data[None, None], meta[None, None]

    in_spec = P("batch", "stripe", None, None)
    if ColorType(color_type) is ColorType.LUMA:
        in_spec = P("batch", "stripe", None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(in_spec, P(None), P(None), P(None), P(None)),
        out_specs=(P("batch", "stripe", None), P("batch", "stripe", None)),
    )
    return jax.jit(fn), geo, spec
