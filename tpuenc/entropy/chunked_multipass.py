"""Bounded-memory device encode for multi-pass modes.

The reference encodes arbitrarily large images in EVERY mode: sequential
and progressive encodes materialize all quantized blocks once
(``/root/reference/src/encoder.rs:977-1056``) and then stream output
scan-by-scan (``encoder.rs:810-864`` sequential, ``encoder.rs:869-975``
progressive), with the optimized-Huffman pass reading the same
materialized blocks (``encoder.rs:1086-1200``).  Above
``api.DEVICE_BLOCK_LIMIT`` the whole-image fused device program can't be
used — its packing tree's transient memory is ~1 KB/block — so round 3
declined those encodes to the slow host packer (VERDICT r3 #3).

This module is the TPU shape of the reference's materialize-then-scan
design with O(chunk) *transient* memory:

1. **Coefficient phase** — MCU-row chunks run the normal pixels->
   coefficients pipeline and append into an HBM-resident per-component
   coefficient store, (64, B) int16 coefficient-major (128 B/block — a
   268 MP 4-component image stores in ~1.3 GB of HBM, comfortably within
   a chip).  Optimized-table modes accumulate their symbol histograms
   chunk-by-chunk in the same pass.
2. **Pack phase** — each scan of the plan packs its store slice in
   fixed-size block chunks through the existing mid-stream pack
   primitives (``dc_diffs_from_dc`` prev_tail/global_offset,
   ``valid_blocks`` masking), with a lookahead-1 dispatch pipeline; the
   host side streams each chunk through a per-scan ``StreamingStuffer``
   exactly like the interleaved chunked path.

Byte parity with the whole-image device path and the host oracle is
pinned by tests/test_chunked.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import ColorType, EncoderConfig, init_components, max_sampling
from .chunked import StreamingStuffer
from .device_encode import (
    BUDGET_LADDER,
    build_scan_plan,
    fetch_bytes,
    tables_to_device,
)
from .pallas_pack import dc_diffs_from_dc, device_scan_pack, pack_tables

# Blocks per pack dispatch: the packing tree's transients are ~1 KB per
# block, so 1M blocks keeps the transient footprint ~1 GB.
PACK_CHUNK_BLOCKS = 1 << 20


@lru_cache(maxsize=16)
def _build_store_update_fn(cols: int):
    def f(store, chunk, off):
        return jax.lax.dynamic_update_slice(store, chunk, (0, off))

    return jax.jit(f, donate_argnums=(0,))


@lru_cache(maxsize=32)
def _build_pack_chunk_fn(chunk_blocks: int, spec, budget: int,
                         n_actabs: int, interpret: bool):
    """jit(store, b0, valid, dc_packed, ac_packed) ->
    (stream_words, meta [ovf, bits], lens int16).

    ``b0`` is the chunk's first global block index (traced: one compile
    per (chunk size, spec, budget)); the DC predecessor comes from the
    store itself (``store[0, b0-1]``), so chunks can dispatch without
    waiting on each other."""

    def f(store, b0, valid, dc_packed, ac_packed):
        chunk = jax.lax.dynamic_slice(
            store, (0, b0), (64, chunk_blocks)
        ).astype(jnp.int32)
        if spec.emit_dc:
            # Previous same-component block's DC: the store column just
            # before the chunk (clamped; masked off at b0 == 0 by
            # global_offset segment logic).
            prev = jax.lax.dynamic_slice(
                store, (0, jnp.maximum(b0 - 1, 0)), (1, 1)
            )[0].astype(jnp.int32)
            dcdiff = dc_diffs_from_dc(
                chunk[0], spec, prev_tail=prev, global_offset=b0
            )
        else:
            dcdiff = jnp.zeros((chunk_blocks,), jnp.int32)
        stream, bits, lens, ovf = device_scan_pack(
            chunk, spec, dc_packed, ac_packed, budget,
            interpret=interpret, dcdiff=dcdiff, valid_blocks=valid,
            cm=True,
        )
        meta = jnp.stack([ovf.astype(jnp.int32), bits])
        return stream, meta, lens[:chunk_blocks].astype(jnp.int16)

    return jax.jit(f)


def _coeff_chunk_builder(width, chunk_px_h, color_type, config, want_hists):
    from ..kernels.pipeline import _use_pallas_fdct

    return _coeff_chunk_builder_impl(
        width, chunk_px_h, color_type, config, want_hists,
        _use_pallas_fdct(),
    )


@lru_cache(maxsize=16)
def _coeff_chunk_builder_impl(width: int, chunk_px_h: int,
                              color_type: ColorType, config: EncoderConfig,
                              want_hists: bool, use_pallas: bool):
    """Per-chunk pixels -> (per-comp (64, b) int16 cm streams
    [, histograms]) program.  Reuses the whole-image coefficient pipeline
    at the chunk's height: a full-height interior chunk gets no bottom
    replication and full component grids; the trailing chunk replicates
    and slices exactly like the global pipeline would for those rows."""
    from ..kernels.pipeline import _build_coefficients_fn

    coeff_fn, _ = _build_coefficients_fn(
        width, chunk_px_h, color_type, config, False
    )
    cm = coeff_fn.raw_fn_cm is not None
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn

    def fn(px):
        streams = inner(px)
        if not cm:
            streams = tuple(s.astype(jnp.int16).T for s in streams)
        else:
            streams = tuple(s.astype(jnp.int16) for s in streams)
        if want_hists:
            from .device import scan_histograms

            jct = ColorType(color_type).jpeg_color_type
            components = init_components(jct, config.sampling_factor)
            hists = scan_histograms(
                streams, components, config.progressive_scans, cm=True
            )
            return streams, hists
        return streams, ()

    return jax.jit(fn)


def encode_multipass_chunked(
    pixels,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
    chunk_mcu_rows: int = 64,
    pack_chunk: int = PACK_CHUNK_BLOCKS,
) -> Optional[List[bytes]]:
    """Encode a sequential/progressive/optimized image of any size on the
    device path with O(chunk) transient memory.  Returns the per-scan
    entropy payloads (stuffed, RST markers inline) in scan-plan order, or
    None if packing overflows the worst-case budget (cannot happen by
    construction).  Mutates ``huffman`` in place with optimized tables
    when the config asks for them (caller emits DHTs accordingly —
    mirrors ``api._device_scan_payloads``)."""
    from ..kernels.pipeline import scan_layout

    color_type = ColorType(color_type)
    assert config.mode() != "interleaved"
    jct = color_type.jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    mcu_h = 8 * max_v
    num_rows = -(-height // mcu_h)

    layout = scan_layout(width, height, color_type, config)
    comp_counts = layout["comp_block_counts"]
    plan = build_scan_plan(layout, components, config)

    interpret = jax.default_backend() != "tpu"

    # ----- Phase 1: coefficients (+ histograms) into the HBM store -----
    want_hists = bool(config.optimize_huffman_table)
    # Per-component pack chunk: never wider than the component itself
    # (rounded to the 256-block pack tile) — a small image must not pad
    # its store to the full 1M-block production chunk.  No lower floor:
    # tests drive tiny pack chunks to pin the mid-stream machinery.
    pack_chunks = [
        min(pack_chunk, -(-b // 256) * 256) for b in comp_counts
    ]
    stores = [
        jnp.zeros((64, -(-b // pc) * pc), jnp.int16)
        for b, pc in zip(comp_counts, pack_chunks)
    ]
    offsets = [0] * len(components)
    hist_acc = None
    chunk_starts: List[List[int]] = []  # per later chunk: first global
    # block index per component (DC boundary correction below)

    chunk_mcu_rows = min(chunk_mcu_rows, num_rows)
    n_full = num_rows // chunk_mcu_rows
    rem_rows = num_rows - n_full * chunk_mcu_rows
    n_chunks = n_full + (1 if rem_rows else 0)

    bpp = color_type.bytes_per_pixel

    def fetch_rows(y0: int, n: int):
        if callable(pixels):
            slab = pixels(y0, n)
            if isinstance(slab, jax.Array):
                if slab.shape[0] < n or slab.shape[1] < width:
                    from ..core import errors

                    raise errors.BadImageData(
                        slab.shape[0] * slab.shape[1] * bpp,
                        n * width * bpp,
                    )
                return slab[:n, :width]
            flat = np.frombuffer(slab, np.uint8) if isinstance(
                slab, (bytes, bytearray, memoryview)
            ) else np.asarray(slab, np.uint8).reshape(-1)
            if flat.size < n * width * bpp:
                from ..core import errors

                raise errors.BadImageData(flat.size, n * width * bpp)
            slab = flat[: n * width * bpp].reshape(n, width, bpp)
            return slab[..., 0] if bpp == 1 else slab
        return pixels[y0: y0 + n]

    for ci in range(n_chunks):
        nrows = chunk_mcu_rows if ci < n_full else rem_rows
        y0 = ci * chunk_mcu_rows * mcu_h
        # Interior chunks are exactly nrows MCU rows of pixels; the last
        # chunk takes the remaining (possibly partial-MCU) pixel rows and
        # the per-chunk pipeline bottom-replicates exactly like the
        # whole-image pipeline (encoder.rs:998-1010 semantics).
        chunk_px_h = min(nrows * mcu_h, height - y0)
        slab = fetch_rows(y0, chunk_px_h)
        fn = _coeff_chunk_builder(
            width, chunk_px_h, color_type, config, want_hists
        )
        streams, hists = fn(jax.device_put(slab) if not isinstance(
            slab, jax.Array) else slab)
        boundary_offs = [
            offsets[c] for c in range(len(components))
        ]  # this chunk's first global block index, per component
        for c, s in enumerate(streams):
            upd = _build_store_update_fn(int(s.shape[1]))
            stores[c] = upd(stores[c], s, jnp.asarray(offsets[c], jnp.int32))
            offsets[c] += int(s.shape[1])
        if ci > 0:
            chunk_starts.append(boundary_offs)
        if want_hists:
            # Accumulate ON DEVICE (async adds); one fetch after the loop
            # — a per-chunk np.asarray would sync every iteration.
            if hist_acc is None:
                hist_acc = [(dc, ac) for dc, ac in hists]
            else:
                hist_acc = [
                    (a0 + b0, a1 + b1)
                    for (a0, a1), (b0, b1) in zip(hist_acc, hists)
                ]
    assert tuple(offsets) == tuple(comp_counts), (offsets, comp_counts)

    # ----- Optimized tables from the accumulated histograms -----
    if want_hists:
        from .huffopt import tables_from_histograms

        hist_np = [
            [np.asarray(dc, np.int64), np.asarray(ac, np.int64)]
            for dc, ac in hist_acc
        ]
        # DC-histogram chunk-boundary correction: each chunk's histogram
        # binned its first block per component against predecessor 0
        # (scan_histograms has no mid-stream form); the true predecessor
        # is the previous chunk's last DC (encoder.rs:1100-1117 runs one
        # unbroken diff chain per component).  Re-bin those few blocks
        # from the coefficient store.
        if chunk_starts:
            for c, comp in enumerate(components):
                idx = np.asarray(
                    [b[c] for b in chunk_starts], np.int32
                )
                dc_now = np.asarray(
                    stores[c][0, jnp.asarray(idx)], np.int64
                )
                dc_prev = np.asarray(
                    stores[c][0, jnp.asarray(idx - 1)], np.int64
                )
                tbl = comp.dc_huffman_table
                for v, p in zip(dc_now, dc_prev):
                    wrong = int(abs(v)).bit_length()
                    right = int(abs(v - p)).bit_length()
                    hist_np[tbl][0][wrong] -= 1
                    hist_np[tbl][0][right] += 1
        for i, pair in enumerate(tables_from_histograms(hist_np)):
            huffman[i] = list(pair)

    tabs = tables_to_device(huffman)
    dc_packed, ac_packed = pack_tables(tabs)
    n_actabs = int(ac_packed.shape[0])

    # ----- Phase 2: per-scan chunked pack with lookahead-1 -----
    budgets = list(BUDGET_LADDER)
    payloads: List[bytes] = []
    for stream_idx, spec, _ in plan:
        B = comp_counts[stream_idx]
        store = stores[stream_idx]
        seg = spec.seg_blocks if spec.seg_blocks > 0 else B
        stuffer = StreamingStuffer(seg, B)
        chunk_blocks = pack_chunks[stream_idx]
        n_pk = -(-B // chunk_blocks)

        def dispatch(i):
            fn = _build_pack_chunk_fn(
                chunk_blocks, spec, budgets[0], n_actabs, interpret
            )
            b0 = i * chunk_blocks
            valid = min(chunk_blocks, B - b0)
            return (
                i,
                fn(
                    store, jnp.asarray(b0, jnp.int32),
                    jnp.asarray(valid, jnp.int32), dc_packed, ac_packed,
                ),
            )

        def resolve(entry):
            i, outs = entry
            while True:
                stream, meta, lens = outs
                meta_np = np.asarray(meta)
                if not meta_np[0]:
                    break
                if len(budgets) == 1:
                    raise RuntimeError("multipass pack overflow at max budget")
                budgets.pop(0)
                _, outs = dispatch(i)
            b0 = i * chunk_blocks
            valid = min(chunk_blocks, B - b0)
            used_words = (int(meta_np[1]) + 31) >> 5
            return stuffer.add_chunk(
                fetch_bytes(stream, used_words), int(meta_np[1]),
                fetch_bytes(lens, valid).astype(np.int64),
            )

        pending = None
        pieces = []
        for i in range(n_pk):
            entry = dispatch(i)
            if pending is not None:
                pieces.append(resolve(pending))
            pending = entry
        if pending is not None:
            pieces.append(resolve(pending))
        pieces.append(stuffer.finish())
        payloads.append(b"".join(p for p in pieces if p))
    return payloads
