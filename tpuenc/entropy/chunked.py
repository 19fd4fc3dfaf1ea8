"""Bounded-memory big-image encode: stream MCU-row bands through the
device coefficient+pack pipeline.

The reference streams one MCU row at a time with O(row) memory
(``/root/reference/src/encoder.rs:699-807``).  The TPU equivalent keeps
the batching the hardware wants while bounding footprint: the image is
processed in chunks of K MCU rows; each chunk runs the fused
color-convert -> fDCT -> quantize -> Pallas entropy-pack program on
device, and the host appends the chunk's raw bitstream (a numpy
bit-granular concatenation) plus per-restart-segment bit counts.  After
the last chunk the accumulated stream is realigned/0xFF-stuffed per
segment by the native packer, exactly like the whole-image v2 path.

Cross-chunk state is tiny and explicit:

* the DC predictor chain — the previous chunk's last ``pat`` DC values
  feed :func:`pallas_pack.dc_diffs_for_spec` as ``prev_tail``;
* the chunk's first global block index (traced scalar), which fixes
  restart-segment geometry and predictor resets mid-stream.

Device memory, host memory and H2D/D2H transfer are all O(chunk), so a
16K x 16K 4-component image encodes without the whole-image device
packer's block-count ceiling.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tables import quantization_table
from ..core.types import ColorType, EncoderConfig, init_components, max_sampling
from . import native


def append_bits(dst: bytearray, dst_bits: int, src: np.ndarray,
                src_bits: int) -> int:
    """Append ``src_bits`` bits of ``src`` (uint8, MSB-first) to ``dst``
    whose current length is ``dst_bits`` bits.  Returns the new bit
    length.  Vectorized byte-granular shift; O(len(src))."""
    if src_bits <= 0:
        return dst_bits
    nbytes = (src_bits + 7) >> 3
    src = src[:nbytes]
    rem_src = src_bits & 7
    if rem_src:  # mask junk past the source's last valid bit
        src = src.copy()
        src[-1] &= (0xFF << (8 - rem_src)) & 0xFF
    sh = dst_bits & 7
    if sh == 0:
        dst += src.tobytes()
    else:
        # First src byte ORs into dst's partial last byte; the rest are
        # pairwise shifted.
        hi = src >> sh
        lo = (src << (8 - sh)) & 0xFF
        dst[-1] |= int(hi[0])
        tail = lo[:-1] | hi[1:]
        dst += tail.tobytes()
        dst.append(int(lo[-1]))
    total = dst_bits + src_bits
    del dst[(total + 7) >> 3 :]
    # Clear any stale bits past the new end in the final partial byte.
    rem = total & 7
    if rem:
        dst[-1] &= (0xFF << (8 - rem)) & 0xFF
    return total


class BitAccumulator:
    """Host-side raw bitstream accumulator for chunk streams."""

    def __init__(self):
        self.buf = bytearray()
        self.bits = 0

    def append_words(self, words: np.ndarray, nbits: int) -> None:
        data = np.ascontiguousarray(words.astype(">u4")).view(np.uint8)
        self.bits = append_bits(self.buf, self.bits, data, int(nbits))


@lru_cache(maxsize=16)
def _build_chunk_fn(
    width: int,
    chunk_mcu_rows: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
):
    """jit((chunk_h, W, C) pixels, prev_tail (pat,), go scalar, tables)
    -> (stream_words, meta [ovf, bits], block_lens, last_tail (pat,)).

    One compile per chunk height; interleaved single-scan only."""
    from ..entropy.device_encode import build_scan_plan
    from ..kernels.pipeline import scan_layout, _blockify
    from ..kernels.fdct import fdct_blocks
    from ..kernels.quantize import quantize_zigzag
    from ..kernels.color_convert import to_planes
    from .pallas_pack import dc_diffs_for_spec, device_scan_pack

    jct = ColorType(color_type).jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    num_cols = -(-width // (8 * max_h))
    rows_local = chunk_mcu_rows
    assert config.mode() == "interleaved"

    # Scan spec from a representative layout (pattern/table geometry is
    # image-size-independent; only seg_blocks matters and it is taken from
    # the restart interval, not the block count).
    layout = scan_layout(width, 8 * max_v, color_type, config)
    plan = build_scan_plan(layout, components, config)
    ((_, spec, _),) = plan
    pat = len(spec.dc_tab_pattern)

    q_tables = [
        quantization_table(config.quantization[0], config.quality, luma=True),
        quantization_table(config.quantization[1], config.quality, luma=False),
    ]
    interpret = jax.default_backend() != "tpu"

    def fn(px, prev_tail, go, dc_packed, ac_packed):
        planes = to_planes(px, color_type)
        streams = []
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
            cv = comp.vertical_sampling_factor
            ch = comp.horizontal_sampling_factor
            x = qz.reshape(rows_local, cv, num_cols, ch, 64)
            x = jnp.moveaxis(x, 1, 2)
            streams.append(x.reshape(rows_local * num_cols, cv * ch, 64))
        mcu = jnp.concatenate(streams, axis=-2)
        blocks_flat = mcu.reshape(-1, 64).astype(jnp.int32)

        dcdiff = dc_diffs_for_spec(
            blocks_flat, spec, prev_tail=prev_tail, global_offset=go,
        )
        stream, bits, lens, ovf = device_scan_pack(
            blocks_flat, spec, dc_packed, ac_packed, budget,
            interpret=interpret, dcdiff=dcdiff,
        )
        last_tail = blocks_flat[-pat:, 0].astype(jnp.int32)
        meta = jnp.stack([ovf.astype(jnp.int32), bits])
        return stream, meta, lens[: blocks_flat.shape[0]], last_tail

    return jax.jit(fn), spec, pat, num_cols


def encode_interleaved_chunked(
    pixels: np.ndarray,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
    chunk_mcu_rows: int = 64,
):
    """Bounded-memory interleaved scan encode.

    Returns the single scan's entropy bytes (stuffed, with RST markers)
    or None if every budget overflows (pathological content).
    """
    from ..entropy.device_encode import BUDGET_LADDER, tables_to_device
    from .pallas_pack import pack_tables

    color_type = ColorType(color_type)
    assert config.mode() == "interleaved"
    jct = color_type.jpeg_color_type
    components = init_components(jct, config.sampling_factor)
    max_h, max_v = max_sampling(components)
    num_cols = -(-width // (8 * max_h))
    num_rows = -(-height // (8 * max_v))
    bpm = sum(
        c.vertical_sampling_factor * c.horizontal_sampling_factor
        for c in components
    )
    total_blocks = num_rows * num_cols * bpm

    tabs = tables_to_device(huffman)
    dc_packed, ac_packed = pack_tables(tabs)

    chunk_mcu_rows = min(chunk_mcu_rows, num_rows)
    n_full = num_rows // chunk_mcu_rows
    rem_rows = num_rows - n_full * chunk_mcu_rows

    mcu_h = 8 * max_v
    pad_w = num_cols * 8 * max_h

    # Edge-replicate to the padded canvas lazily per chunk (O(chunk) host
    # memory for the padded slab).
    def chunk_pixels(row0: int, nrows: int) -> np.ndarray:
        y0 = row0 * mcu_h
        y1 = min((row0 + nrows) * mcu_h, height)
        slab = pixels[y0:y1]
        pad_y = (row0 + nrows) * mcu_h - y0 - slab.shape[0]
        pad = [(0, pad_y), (0, pad_w - width)] + [(0, 0)] * (slab.ndim - 2)
        return np.pad(slab, pad, mode="edge")

    for budget in BUDGET_LADDER:
        spec_seg = None
        acc = BitAccumulator()
        all_lens = []
        prev_tail = None
        go = 0
        overflowed = False
        for ci in range(n_full + (1 if rem_rows else 0)):
            nrows = chunk_mcu_rows if ci < n_full else rem_rows
            fn, spec, pat, _ = _build_chunk_fn(
                width, nrows, color_type, config, budget
            )
            if prev_tail is None:
                prev_tail = jnp.zeros((pat,), jnp.int32)
            spec_seg = spec.seg_blocks
            px = chunk_pixels(ci * chunk_mcu_rows, nrows)
            stream, meta, lens, last_tail = fn(
                jax.device_put(px), prev_tail,
                jnp.asarray(go, jnp.int32), dc_packed, ac_packed,
            )
            meta_np = np.asarray(meta)
            if meta_np[0]:
                overflowed = True
                break
            acc.append_words(np.asarray(stream), int(meta_np[1]))
            all_lens.append(np.asarray(lens).astype(np.int64))
            prev_tail = last_tail
            go += nrows * num_cols * bpm
        if overflowed:
            continue

        lens_all = np.concatenate(all_lens)[:total_blocks]
        seg = spec_seg if spec_seg and spec_seg > 0 else total_blocks
        n_seg = -(-total_blocks // seg)
        padded = np.pad(lens_all, (0, n_seg * seg - total_blocks))
        seg_bits = padded.reshape(n_seg, seg).sum(axis=1)

        data = bytes(acc.buf)
        stuffed = native.realign_segments(data, seg_bits)
        if stuffed is None:
            stuffed = native.realign_segments_py(data, seg_bits.tolist())
        return stuffed
    return None
