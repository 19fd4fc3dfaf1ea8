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
        # Big-endian byte stream of the packed words.  ``byteswap`` is
        # numpy's SIMD path (~GB/s); ``astype('>u4')`` takes a
        # per-element conversion loop (~200 MB/s measured) for the same
        # bytes.
        import sys

        w = np.ascontiguousarray(words, dtype=np.uint32)
        data = (w.byteswap() if sys.byteorder == "little" else w).view(
            np.uint8
        )
        self.bits = append_bits(self.buf, self.bits, data, int(nbits))


def _extract_bytes(buf: bytearray, rel_bit: int, nbytes: int) -> bytes:
    """Whole output bytes [rel_bit, rel_bit + 8*nbytes) of the raw bit
    buffer, MSB-first (vectorized shift)."""
    if nbytes <= 0:
        return b""
    b0 = rel_bit >> 3
    sh = rel_bit & 7
    a = np.frombuffer(bytes(memoryview(buf)[b0 : b0 + nbytes + 1]), np.uint8)
    if sh == 0:
        return a[:nbytes].tobytes()
    if a.shape[0] < nbytes + 1:
        a = np.concatenate([a, np.zeros(nbytes + 1 - a.shape[0], np.uint8)])
    w = (a.astype(np.uint16) << 8)
    out = ((w[:-1] | a[1:]) >> (8 - sh)).astype(np.uint8)
    return out.tobytes()


class StreamingStuffer:
    """Incrementally turn the raw device bitstream into the final stuffed,
    RST-marker-interleaved scan bytes with O(pending-chunk) memory.

    Segments start byte-aligned in the output (1-padded tails), so any
    whole output byte of the current segment is final as soon as its bits
    exist — it can be 0xFF-stuffed (0xFF -> 0xFF 0x00) and flushed
    immediately, mirroring the reference's streaming bit writer
    (writer.rs:138-202) at chunk granularity.
    """

    def __init__(self, seg_blocks: int, total_blocks: int):
        self.seg = max(int(seg_blocks), 1)
        self.total = int(total_blocks)
        self.n_seg = -(-self.total // self.seg) if self.total else 1
        self.acc = BitAccumulator()
        self.base_bit = 0       # absolute bit index of acc.buf[0] bit 0
        self.read_bit = 0       # absolute next-unflushed bit
        self.blocks_done = 0
        self.seg_idx = 0
        self.seg_bits = 0       # bits fed into the current segment so far
        self.seg_flushed = 0    # whole bytes of the current segment flushed

    def _seg_len(self, idx: int) -> int:
        if idx == self.n_seg - 1:
            return self.total - idx * self.seg
        return self.seg

    def add_chunk(self, words: np.ndarray, nbits: int,
                  lens: np.ndarray) -> bytes:
        """Feed one device chunk (packed words + per-block bit lengths);
        returns the output bytes that became final."""
        self.acc.append_words(words, nbits)
        out = bytearray()
        lens = np.asarray(lens, dtype=np.int64)
        pos = 0
        n = lens.shape[0]
        while pos < n:
            room = self._seg_len(self.seg_idx) - (
                self.blocks_done - self.seg_idx * self.seg
            )
            take = min(room, n - pos)
            self.seg_bits += int(lens[pos : pos + take].sum())
            self.blocks_done += take
            pos += take
            if take == room:
                self._finish_segment(out)
        # Mid-segment: flush any whole bytes that are already final.  The
        # bulk path goes through the native chunk-parallel stuffer
        # (tpuenc_stuff_stream, ~1 GB/s on 4 cores) — measured as the
        # chunked pipeline's host cap at 111 MB/s through the numpy
        # extract + bytes.replace fallback below.
        avail = (self.seg_bits - 8 * self.seg_flushed) >> 3
        if avail > 0:
            stuffed = None
            if avail >= (1 << 16):
                from . import native

                stuffed = native.stuff_stream(
                    self.acc.buf, self.read_bit - self.base_bit, avail
                )
            if stuffed is None:
                stuffed = _extract_bytes(
                    self.acc.buf, self.read_bit - self.base_bit, avail
                ).replace(b"\xff", b"\xff\x00")
            out += stuffed
            self.read_bit += 8 * avail
            self.seg_flushed += avail
        self._compact()
        return bytes(out)

    def _finish_segment(self, out: bytearray) -> None:
        nbits = self.seg_bits - 8 * self.seg_flushed
        if nbits > 0:
            whole = nbits >> 3
            raw = _extract_bytes(
                self.acc.buf, self.read_bit - self.base_bit, whole
            )
            out += raw.replace(b"\xff", b"\xff\x00")
            rem = nbits & 7
            if rem:
                rel = self.read_bit - self.base_bit + 8 * whole
                b0 = rel >> 3
                window = int.from_bytes(self.acc.buf[b0 : b0 + 2], "big") \
                    if b0 + 1 < len(self.acc.buf) else \
                    int.from_bytes(
                        self.acc.buf[b0 : b0 + 1] + b"\x00", "big"
                    )
                sh = rel & 7
                bits = (window >> (16 - sh - rem)) & ((1 << rem) - 1)
                pad = 8 - rem
                byte = (bits << pad) | ((1 << pad) - 1)
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
            self.read_bit += nbits
        self.seg_idx += 1
        self.seg_bits = 0
        self.seg_flushed = 0
        if self.seg_idx < self.n_seg:
            out += bytes((0xFF, 0xD0 + ((self.seg_idx - 1) & 7)))

    def finish(self) -> bytes:
        """Assert all blocks were fed; every byte was already flushed by
        :meth:`add_chunk` (the final segment closes with its last block)."""
        if self.blocks_done != self.total:
            raise ValueError(
                f"fed {self.blocks_done} blocks, expected {self.total}"
            )
        if self.seg_idx != self.n_seg:
            raise ValueError("segment accounting mismatch")
        return b""

    def _compact(self) -> None:
        drop = (self.read_bit - self.base_bit) >> 3
        if drop > 4096:
            del self.acc.buf[:drop]
            self.base_bit += 8 * drop
            self.acc.bits -= 8 * drop


def _build_chunk_fn(
    width: int,
    chunk_mcu_rows: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
):
    from ..kernels.pipeline import _use_pallas_fdct

    return _build_chunk_fn_impl(
        width, chunk_mcu_rows, color_type, config, budget,
        _use_pallas_fdct(),
    )


@lru_cache(maxsize=16)
def _build_chunk_fn_impl(
    width: int,
    chunk_mcu_rows: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
    use_pallas: bool,
):
    """jit((chunk_h, W, C) pixels, prev_tail (pat,), go scalar, tables)
    -> (stream_words, meta [ovf, bits], block_lens, last_tail (pat,)).

    One compile per chunk height; interleaved single-scan only.  On the
    Pallas path the chunk runs coefficient-major (64, B) end-to-end —
    fused Mosaic fDCT+quantize into the cm pack — exactly like the
    whole-image fused program."""
    from ..entropy.device_encode import build_scan_plan
    from ..kernels.pipeline import scan_layout, _blockify, _blockify_cm
    from ..kernels.fdct import fdct_blocks
    from ..kernels.quantize import quantize_zigzag
    from ..kernels.color_convert import to_planes
    from .pallas_pack import (
        dc_diffs_for_spec,
        dc_diffs_from_dc,
        device_scan_pack,
    )

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

    def fn_cm(px, prev_tail, go, dc_packed, ac_packed):
        from ..kernels.pallas_fdct import fdct_quantize_pallas_cm

        planes = to_planes(px, color_type)
        streams = []
        for comp in components:
            h_scale = max_h // comp.horizontal_sampling_factor
            v_scale = max_v // comp.vertical_sampling_factor
            x_cm = _blockify_cm(planes[comp.id], v_scale, h_scale)
            x = fdct_quantize_pallas_cm(
                x_cm, q_tables[comp.quantization_table]
            )
            cv = comp.vertical_sampling_factor
            ch = comp.horizontal_sampling_factor
            if cv > 1 or ch > 1:  # raster -> MCU lane permutation
                x = x.reshape(64, rows_local, cv, num_cols, ch)
                x = x.transpose(0, 1, 3, 2, 4)
            streams.append(x.reshape(64, rows_local * num_cols, cv * ch))
        mcu = jnp.concatenate(streams, axis=-1).reshape(64, -1)

        dcdiff = dc_diffs_from_dc(
            mcu[0], spec, prev_tail=prev_tail, global_offset=go,
        )
        stream, bits, lens, ovf = device_scan_pack(
            mcu, spec, dc_packed, ac_packed, budget,
            interpret=interpret, dcdiff=dcdiff, cm=True,
        )
        B = mcu.shape[1]
        last_tail = mcu[0, -pat:].astype(jnp.int32)
        meta = jnp.stack([ovf.astype(jnp.int32), bits])
        # int16 halves the per-block-length fetch (a block's entropy bits
        # are bounded by 64 single-word items < 2^15).
        return stream, meta, lens[:B].astype(jnp.int16), last_tail

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
        return (stream, meta,
                lens[: blocks_flat.shape[0]].astype(jnp.int16), last_tail)

    return jax.jit(fn_cm if use_pallas else fn), spec, pat, num_cols


def iter_encode_interleaved_chunked(
    pixels: np.ndarray,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
    chunk_mcu_rows: int = 64,
):
    """Bounded-memory interleaved scan encode, yielding final scan bytes
    (stuffed, RST markers inline) as each MCU-row band completes.

    This is the streaming-sink path (reference model: O(row) streaming
    writes, ``encoder.rs:699-807`` / ``writer.rs:76-106``): device memory,
    host memory, transfers AND the retained output are all O(chunk).
    Budget overflows escalate per-chunk (packed bits are
    budget-independent), so already-yielded bytes stay valid; the top
    ladder budget is worst-case safe and cannot overflow.
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
    # memory for the padded slab).  ``pixels`` is either the full (H, W[, C])
    # array or a pull-model row source — a callable ``(y0, n) -> rows`` —
    # the TPU-shaped analog of the reference's per-scanline
    # ``ImageBuffer::fill_buffers`` (image_buffer.rs:86-98): input host
    # memory then stays O(chunk) even for 16K-class images.
    bpp = color_type.bytes_per_pixel

    def fetch_rows(y0: int, n: int):
        if callable(pixels):
            slab = pixels(y0, n)
            if isinstance(slab, jax.Array):
                # Device-resident row source (pixels already in HBM,
                # e.g. produced by another TPU program): no host round
                # trip; shape-validated, padded on device below.
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
        return pixels[y0 : y0 + n]

    def chunk_pixels(row0: int, nrows: int):
        y0 = row0 * mcu_h
        y1 = min((row0 + nrows) * mcu_h, height)
        slab = fetch_rows(y0, y1 - y0)
        pad_y = (row0 + nrows) * mcu_h - y0 - slab.shape[0]
        pad = [(0, pad_y), (0, pad_w - width)] + [(0, 0)] * (slab.ndim - 2)
        if isinstance(slab, jax.Array):
            if pad_y == 0 and pad_w == width:
                return slab
            return jnp.pad(slab, pad, mode="edge")
        return np.pad(slab, pad, mode="edge")

    # Lookahead-1 pipeline: chunk ci+1 is DISPATCHED (async) before chunk
    # ci's metadata is fetched, so the per-chunk host sync round trip and
    # the host stuffing of chunk ci overlap the device compute of ci+1.
    # This is sound because the DC-boundary tail fed to chunk ci+1 is
    # derived from the *input* DC coefficients (dc_diffs_from_dc), not
    # from the packed output — a budget escalation of chunk ci re-packs
    # the same bits and never changes ci+1's inputs.  The device input
    # slab stays alive inside the pending entry, so escalation re-packs
    # without re-reading the (possibly single-pass) row source.
    from .device_encode import fetch_bytes

    budgets = list(BUDGET_LADDER)
    stuffer = None
    n_chunks = n_full + (1 if rem_rows else 0)
    prev_tail = None
    go = 0
    pending = None  # (ci, dpx, outputs, nrows, prev_tail_in, go_in)

    def dispatch(ci, prev_tail_in, go_in, dpx=None):
        nrows = chunk_mcu_rows if ci < n_full else rem_rows
        fn, spec, pat, _ = _build_chunk_fn(
            width, nrows, color_type, config, budgets[0]
        )
        if prev_tail_in is None:
            prev_tail_in = jnp.zeros((pat,), jnp.int32)
        if dpx is None:
            dpx = jax.device_put(chunk_pixels(ci * chunk_mcu_rows, nrows))
        outs = fn(
            dpx, prev_tail_in, jnp.asarray(go_in, jnp.int32),
            dc_packed, ac_packed,
        )
        return (ci, dpx, outs, nrows, prev_tail_in, go_in), spec

    def resolve(entry):
        ci, dpx, outs, nrows, prev_tail_in, go_in = entry
        while True:
            stream, meta, lens, _ = outs
            meta_np = np.asarray(meta)
            if not meta_np[0]:
                break
            if len(budgets) == 1:  # top budget is worst-case safe
                raise RuntimeError("chunked pack overflow at max budget")
            budgets.pop(0)  # escalate THIS chunk; earlier bytes stay valid
            entry, _ = dispatch(ci, prev_tail_in, go_in, dpx=dpx)
            outs = entry[2]
        nblocks = nrows * num_cols * bpm
        # Fetch only the words actually packed (bits/32), not the whole
        # budget-capacity buffer — on big images the capacity is several
        # x the payload and the fetch dominates the wall time on thin
        # host links (measured 3x end-to-end on 16K x 16K).
        used_words = (int(meta_np[1]) + 31) >> 5
        return stuffer.add_chunk(
            fetch_bytes(stream, used_words), int(meta_np[1]),
            fetch_bytes(lens, nblocks).astype(np.int64),
        )

    for ci in range(n_chunks):
        entry, spec = dispatch(ci, prev_tail, go)
        if stuffer is None:
            seg = spec.seg_blocks if spec.seg_blocks > 0 else total_blocks
            stuffer = StreamingStuffer(seg, total_blocks)
        prev_tail = entry[2][3]  # device handle; no sync
        go += entry[3] * num_cols * bpm
        if pending is not None:
            piece = resolve(pending)
            if piece:
                yield piece
        pending = entry
    if pending is not None:
        piece = resolve(pending)
        if piece:
            yield piece
    tail = stuffer.finish() if stuffer is not None else b""
    if tail:
        yield tail


def encode_interleaved_chunked(
    pixels: np.ndarray,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
    chunk_mcu_rows: int = 64,
):
    """Whole-scan wrapper over :func:`iter_encode_interleaved_chunked`.

    Returns the single scan's entropy bytes (stuffed, with RST markers)
    or None if the pack overflows even the worst-case budget (cannot
    happen by construction; kept for the caller's fallback contract).
    """
    try:
        return b"".join(
            iter_encode_interleaved_chunked(
                pixels, width, height, color_type, config, huffman,
                chunk_mcu_rows,
            )
        )
    except RuntimeError:
        return None
