"""Fused device encode: pixels -> final scan bytes on-device.

Orchestrates the whole-image encode as (at most) two jit calls so that only
compressed bytes and tiny metadata ever cross the host link:

* default-table modes: ONE jit program runs color convert -> fDCT ->
  quantize -> device bit packing (``device_pack.scan_pack``) for every scan
  of the mode, assembles all scan streams into a single byte buffer with
  dynamic-offset writes, and returns (buffer, meta).
* optimized-table modes: call 1 produces coefficients (kept on device) plus
  psum-able symbol histograms; the host runs the tiny K.2 table build; call
  2 packs with the optimized tables passed as array arguments (no
  recompile).

The host then performs the O(output) finishing pass: split per scan /
restart segment, 0xFF-stuff, insert RST markers (native
``tpuenc_stuff_segments``) and splice JFIF headers.

Chunk capacities in the packing tree follow a words-per-block budget;
on the (rare) overflow the encode retries with a fatter budget —
escalating to a worst-case-safe bound — and remembers the working budget
per (shape, config).
"""

from __future__ import annotations

from collections import OrderedDict
from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tables import HuffmanTable, quantization_table
from ..core.types import ColorType, EncoderConfig, init_components, max_sampling
from . import native
from .device_pack import ScanSpec, scan_pack, words_to_bytes
from .huffopt import progressive_bands

# Worst-case-safe budget: a block's items can never exceed 193 words
# (64 slots x 3 words + tail), so 224 words/block never clips.
#
# The budget plays two roles with very different typical/worst-case gaps:
# per-BLOCK caps must hold the single busiest block (hundreds of bits),
# while the AGGREGATE caps of the cross-block merges (P2 chunk merge, P3
# fold, P4 concat) only need the average plus slack — q90 natural content
# averages ~1.6 words/block against the old uniform 16, so the fold/concat
# stages were barrel-shifting 4-10x more cap than content (attr_pack r4).
# Block-level schedules therefore clamp the budget to >= 16
# (``max(budget, 16)`` at the block-cap call sites) while the aggregate
# schedules use the ladder value as-is, letting the ladder start small.
# Measured on the 2000x1800 bench image (noise-heavy, 136.6 bits/block
# avg): window maxima are ~4.4 words/block at every span, so 4 fits only
# natural-photo content (~1-3 words/block) and 8 fits the bench with ~2x
# headroom; the ladder learns the right rung per (shape, config) via
# ``_budget_memo``.  Rungs 5/6 fit the noise-heavy q90 bench content
# that overflows 4 (probe r5: rung 5 packs the flagship at 1930 MP/s vs
# 1730 at the old 8 — the P2-P4 aggregate caps scale with the rung).
# The 14 rung is sized to dense q100 content with DEFAULT tables
# (probe_budget.py: 12 overflows, 14 packs the q100 bench image at
# 1384 MP/s vs 1296 at 16); 12 is the K.2-OPTIMIZED-table rung for the
# same content (shorter codes: avg 10.70 words/block, fits 12, pack
# 1.37 vs 1.70 ms — probe_opt r5); 16 stays so content in the narrow
# 14-16 band pays one extra compile instead of jumping to 48.
BUDGET_LADDER = (4, 5, 6, 8, 12, 14, 16, 48, 224)

# (key) -> working budget, learned across calls.  Bounded LRU: long-running
# services encoding many distinct shapes must not grow it without limit,
# and evicting one stale entry beats dropping every learned budget at once.
_budget_memo: OrderedDict = OrderedDict()
_BUDGET_MEMO_MAX = 4096


def _memo_put(key, budget: int) -> None:
    if key in _budget_memo:
        _budget_memo.move_to_end(key)
    elif len(_budget_memo) >= _BUDGET_MEMO_MAX:
        _budget_memo.popitem(last=False)
    _budget_memo[key] = budget


def _dc_prev_delta(pattern: Tuple[int, ...]) -> Tuple[int, ...]:
    """Distance from each pattern slot to the previous slot of the same
    component in the cyclically repeated pattern."""
    n = len(pattern)
    deltas = []
    for s in range(n):
        d = 1
        while d <= n:
            if pattern[(s - d) % n] == pattern[s]:
                break
            d += 1
        deltas.append(d)
    return tuple(deltas)


def build_scan_plan(layout, components, config: EncoderConfig):
    """List of (stream_index, ScanSpec, spectral) for the config's mode.

    ``stream_index`` selects which coefficient stream feeds the scan: 0 for
    the interleaved MCU stream, or the component index for
    sequential/progressive scans.  ``spectral`` is the SOS (Ss, Se) pair.
    """
    mode = config.mode()
    scans = []
    if mode == "interleaved":
        comp_pattern = layout["mcu_block_comps"]
        dc_pat = tuple(components[c].dc_huffman_table for c in comp_pattern)
        ac_pat = tuple(components[c].ac_huffman_table for c in comp_pattern)
        delta = _dc_prev_delta(comp_pattern)
        seg = (config.restart_interval or 0) * len(comp_pattern)
        scans.append(
            (
                0,
                ScanSpec(1, 64, True, True, dc_pat, ac_pat, delta, seg),
                None,
            )
        )
        return scans

    interval = config.restart_interval or 0
    if mode == "sequential":
        for i, comp in enumerate(components):
            scans.append(
                (
                    i,
                    ScanSpec(
                        1, 64, True, True,
                        (comp.dc_huffman_table,), (comp.ac_huffman_table,),
                        (1,), interval,
                    ),
                    None,
                )
            )
        return scans

    # Progressive: per-component DC scans, then AC bands with the component
    # loop inside the band loop (encoder.rs:869-975).
    for i, comp in enumerate(components):
        scans.append(
            (
                i,
                ScanSpec(
                    1, 1, True, False,
                    (comp.dc_huffman_table,), (comp.ac_huffman_table,),
                    (1,), interval,
                ),
                (0, 0),
            )
        )
    for start, end in progressive_bands(config.progressive_scans):
        for i, comp in enumerate(components):
            scans.append(
                (
                    i,
                    ScanSpec(
                        start, end, False, True,
                        (comp.dc_huffman_table,), (comp.ac_huffman_table,),
                        (1,), interval,
                    ),
                    (start, end - 1),
                )
            )
    return scans


def _n_segments(n_blocks: int, seg_blocks: int) -> int:
    seg = seg_blocks if seg_blocks > 0 else n_blocks
    return -(-n_blocks // seg)


def pack_version() -> str:
    """Which device bit-packer to use: the round-2 Pallas pipeline ("v2",
    default on TPU) or the XLA log-tree ("v1", default elsewhere).
    Override with TPUENC_PACK=v1|v2."""
    import os

    v = os.environ.get("TPUENC_PACK", "auto")
    if v in ("v1", "v2"):
        return v
    return "v2" if jax.default_backend() == "tpu" else "v1"


def _pack_scans_v2(comp_streams, scan_plan, dc_packed, ac_packed, budget,
                   interpret=False, cm=False):
    """Pallas-pipeline analog of :func:`_pack_scans`.

    Scans are packed as raw (unaligned) bitstreams and placed into one
    uint32 word buffer at word offsets; segment alignment happens on the
    host (``native.realign_segments``).  meta = [overflow, scan_bits...,
    seg_bits...] with seg_bits UNPADDED bit counts.
    """
    from .pallas_pack import (
        _dc_only_pack_blocks,
        merge_pack_stream,
        scan_pack_blocks,
        scan_pack_blocks_acbands,
    )

    # Phase 1 per scan (per-block bitstrings), then ONE shared P2-P4
    # merge over the concatenated block axis: the raw stream is the bit
    # concatenation of the scans in plan order, and the host slices each
    # scan out at its bit offset (realign_segments bit_offset).  The
    # per-program launch floor (~0.2-0.5 ms) used to be paid 3+3(n-1)
    # times for progressive plans; now once.
    #
    # Progressive AC band scans of the same component additionally share
    # ONE multi-band phase-1 kernel (scan_pack_blocks_acbands): the tile
    # load, last-nonzero scan and magnitude categories are computed once
    # per component instead of once per band scan.
    groups: dict = {}
    for i, (stream_idx, spec, _) in enumerate(scan_plan):
        if (
            spec.emit_ac
            and not spec.emit_dc
            and len(spec.ac_tab_pattern) == 1
        ):
            groups.setdefault(stream_idx, []).append(i)
    banded: dict = {}
    overflow = jnp.asarray(False)
    for stream_idx, idxs in groups.items():
        if len(idxs) < 2:
            continue
        order = sorted(
            idxs, key=lambda i: scan_plan[i][1].spectral_start
        )
        for k in range(0, len(order), 4):  # <= 4 bands per launch (VMEM)
            batch = order[k:k + 4]
            if len(batch) < 2:
                outs = None  # lone tail band: regular per-scan path
            else:
                outs, ovf = scan_pack_blocks_acbands(
                    comp_streams[stream_idx],
                    [scan_plan[i][1] for i in batch],
                    ac_packed, budget, interpret=interpret, cm=cm,
                )
                overflow = overflow | ovf
                for i, out in zip(batch, outs):
                    banded[i] = out

    w_list = []
    l_list = []
    scan_bits = []
    seg_bits_all = []
    for i, (stream_idx, spec, _) in enumerate(scan_plan):
        blocks = comp_streams[stream_idx]
        B = blocks.shape[1] if cm else blocks.shape[0]
        if i in banded:
            words, lens = banded[i]
        elif spec.emit_dc and not spec.emit_ac:
            words, lens, ovf = _dc_only_pack_blocks(
                blocks, spec, dc_packed, 512, cm=cm
            )
            overflow = overflow | ovf
        else:
            words, lens, ovf = scan_pack_blocks(
                blocks, spec, dc_packed, ac_packed, budget,
                interpret=interpret, cm=cm,
            )
            overflow = overflow | ovf
        seg = spec.seg_blocks if spec.seg_blocks > 0 else B
        n_seg = -(-B // seg)
        lens_real = lens[:B]
        padded = jnp.pad(lens_real, (0, n_seg * seg - B))
        seg_bits_all.append(padded.reshape(n_seg, seg).sum(axis=1))
        scan_bits.append(jnp.sum(lens, dtype=jnp.int32))
        w_list.append(words)
        l_list.append(lens)

    capB = max(w.shape[1] for w in w_list)
    W = jnp.concatenate(
        [jnp.pad(w, ((0, 0), (0, capB - w.shape[1]))) for w in w_list],
        axis=0,
    )
    L = jnp.concatenate(l_list)
    out, _, ovf2 = merge_pack_stream(W, L, budget, interpret=interpret)

    meta = jnp.concatenate(
        [
            (overflow | ovf2).astype(jnp.int32)[None],
            jnp.stack(scan_bits),
            jnp.concatenate(seg_bits_all),
        ]
    )
    return out, meta


def _pack_tables_jnp(dc_sizes, dc_codes, ac_sizes, ac_codes):
    """v2 packed-table layout from the four (T,256) lookup arrays:
    dc (1, 128) int32 [tab*16 + size, zero-padded lane vreg], ac (T, 256)
    int32 [size<<16|code]."""
    T = dc_sizes.shape[0]
    assert T <= 4
    dcp = (dc_sizes[:, :16].astype(jnp.uint32) << 16) | \
        dc_codes[:, :16].astype(jnp.uint32)
    dc_packed = jnp.pad(
        jnp.pad(dcp, ((0, 4 - T), (0, 0))).reshape(1, 64), ((0, 0), (0, 64))
    )
    ac_packed = (ac_sizes.astype(jnp.uint32) << 16) | \
        ac_codes.astype(jnp.uint32)
    return dc_packed.astype(jnp.int32), ac_packed.astype(jnp.int32)


def _use_device_stuff() -> bool:
    """SURVEY §7 step-4 opt-in: realign + 0xFF stuffing + RST insertion
    on device (``entropy.device_stuff``), making host finishing a pure
    byte split.  Off by default: in batch mode the host finish overlaps
    device compute for free, so burning device cycles on it only pays
    when host cores are the bottleneck."""
    import os

    return os.environ.get("TPUENC_DEVICE_STUFF") == "1"


def _finish_scans_v2_device(buf_words, meta_np, scan_plan, seg_structure):
    """Device-side finishing: one stuff pass over the whole raw stream,
    then the host just splits per-scan byte ranges.  Returns None if the
    stuffed stream overflowed the device buffer's slack (pathological
    0xFF density) — caller falls back to the host finish."""
    from .device_stuff import device_stuff

    n_scans = len(scan_plan)
    seg_bits = meta_np[1 + n_scans:]
    out, seg_out, _total = device_stuff(buf_words, seg_bits, seg_structure)
    seg_out_np = np.asarray(seg_out)
    total = int(seg_out_np.sum())
    if total > int(out.shape[0]):
        return None
    data = fetch_bytes(out, total)
    scans = []
    off = 0
    s = 0
    for nseg in seg_structure:
        n = int(seg_out_np[s:s + nseg].sum())
        s += nseg
        scans.append(data[off:off + n].tobytes())
        off += n
    return scans


def _finish_scans_v2(buf_words, meta_np, scan_plan, seg_structure):
    """Host finishing for the v2 packer: the buffer holds ONE raw bit
    concatenation of all scans in plan order (shared P2-P4 merge); each
    scan is realigned/padded/stuffed straight from its bit offset."""
    import sys

    n_scans = len(scan_plan)
    scan_bits = meta_np[1 : 1 + n_scans]
    seg_bits = meta_np[1 + n_scans :]
    total_words = (int(scan_bits.sum()) + 31) >> 5
    w = np.ascontiguousarray(buf_words[:total_words], dtype=np.uint32)
    data = (w.byteswap() if sys.byteorder == "little" else w).tobytes()
    scans = []
    bit_off = 0
    seg_off = 0
    for i in range(n_scans):
        bits = int(scan_bits[i])
        nseg = seg_structure[i]
        segs = seg_bits[seg_off : seg_off + nseg].astype(np.int64)
        seg_off += nseg
        stuffed = native.realign_segments(data, segs, bit_offset=bit_off)
        if stuffed is None:
            stuffed = native.realign_segments_py(
                data, segs.tolist(), bit_offset=bit_off
            )
        scans.append(stuffed)
        bit_off += bits
    return scans


def _pack_scans(comp_streams, scan_plan, block_counts, tabs, budget):
    """Pack every scan and assemble one byte buffer on device.

    Returns (buf_u8, meta_i32) where meta = [overflow,
    scan_bits..., seg_bits...] (scan order, then all segments in order).
    """
    dc_sizes, dc_codes, ac_sizes, ac_codes = tabs
    bufs = []
    scan_bits = []
    seg_bits_all = []
    overflow = jnp.asarray(False)
    caps_bytes = []
    for stream_idx, spec, _ in scan_plan:
        words, bits, seg_bits, ovf = scan_pack(
            comp_streams[stream_idx], spec,
            dc_sizes, dc_codes, ac_sizes, ac_codes, budget,
        )
        bufs.append(words_to_bytes(words))
        caps_bytes.append(bufs[-1].shape[0])
        scan_bits.append(bits)
        seg_bits_all.append(seg_bits)
        overflow = overflow | ovf

    total_cap = sum(caps_bytes)
    out = jnp.zeros((total_cap,), dtype=jnp.uint8)
    offset = jnp.zeros((), dtype=jnp.int32)
    for b, bits in zip(bufs, scan_bits):
        out = jax.lax.dynamic_update_slice(out, b, (offset,))
        offset = offset + (bits >> 3)

    meta = jnp.concatenate(
        [
            overflow.astype(jnp.int32)[None],
            jnp.stack(scan_bits),
            jnp.concatenate(seg_bits_all),
        ]
    )
    return out, meta


@lru_cache(maxsize=32)
def _build_fused_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
    version: str = "v1",
):
    """jit(pixels, dc_sizes, dc_codes, ac_sizes, ac_codes) -> (buf, meta)."""
    from ..kernels.pipeline import _build_coefficients_fn, scan_layout

    layout = scan_layout(width, height, color_type, config)
    components = layout["components"]
    scan_plan = build_scan_plan(layout, components, config)

    # Re-create the coefficient pipeline inline so everything fuses into a
    # single program.
    coeff_fn, _ = _build_coefficients_fn(width, height, color_type, config, False)
    # v2 + Pallas fDCT: the whole program runs coefficient-major (64, B)
    # end-to-end — no blockify/MCU-order/pack transposes (measured ~1.5 ms
    # per 3.6 MP saved vs the block-major layout round trips).
    cm = version == "v2" and coeff_fn.raw_fn_cm is not None
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn
    interpret = jax.default_backend() != "tpu"

    # Interleaved single-scan v2 EXPERIMENT (TPUENC_FUSED_P1=1): fuse
    # fDCT + quantize + DC diff + P1 into ONE Mosaic kernel
    # (pallas_pack.fused_sample_pack_blocks) — the coefficient stream
    # never exists in HBM and the separate P1 launch disappears.
    # Byte-identical, but measured SLOWER on v5e (flagship 1679 vs ~1930
    # MP/s; P1-only 1.64 vs split coeff+P1 1.37 ms at tiles 256/512/
    # 1024): the saved 2x21.6 MB HBM round trip (~0.06 ms) is dwarfed by
    # the combined kernel's worse VPU scheduling — the 64-row butterfly
    # chain and the P1 register file together exceed what Mosaic
    # overlaps across grid steps.  Off by default; kept as the measured
    # answer to the fdct+P1-fusion roadmap item (docs/PERF.md r5).
    import os

    use_fused_p1 = (
        cm
        and layout["interleaved"]
        and len(scan_plan) == 1
        and coeff_fn.raw_fn_cm_samples is not None
        and os.environ.get("TPUENC_FUSED_P1", "0") == "1"
    )
    if use_fused_p1:
        import numpy as _np

        from ..core.tables import ZIGZAG
        from .pallas_pack import fused_sample_pack_blocks, merge_pack_stream

        q_tables = [
            quantization_table(config.quantization[0], config.quality, True),
            quantization_table(config.quantization[1], config.quality, False),
        ]
        recip2 = _np.stack(
            [_np.asarray(t.reciprocals)[ZIGZAG] for t in q_tables], axis=1
        ).astype(_np.int32)
        corr2 = _np.stack(
            [_np.asarray(t.corrections)[ZIGZAG] for t in q_tables], axis=1
        ).astype(_np.int32)
        qtab_pattern = tuple(
            components[c].quantization_table
            for c in layout["mcu_block_comps"]
        )
        (_, spec0, _), = scan_plan
        samples_fn = coeff_fn.raw_fn_cm_samples
        B_total = len(layout["mcu_block_comps"]) * layout["mcu_count"]
        seg0 = spec0.seg_blocks if spec0.seg_blocks > 0 else B_total
        n_seg0 = -(-B_total // seg0)

        def fn(pixels, dc_sizes, dc_codes, ac_sizes, ac_codes):
            x_cm = samples_fn(pixels)
            dc_p, ac_p = _pack_tables_jnp(
                dc_sizes, dc_codes, ac_sizes, ac_codes
            )
            words, lens, ovf = fused_sample_pack_blocks(
                x_cm, spec0, qtab_pattern,
                jnp.asarray(recip2), jnp.asarray(corr2),
                dc_p, ac_p, budget, interpret=interpret,
            )
            out, _, ovf2 = merge_pack_stream(
                words, lens, budget, interpret=interpret
            )
            lens_real = lens[:B_total]
            padded = jnp.pad(lens_real, (0, n_seg0 * seg0 - B_total))
            seg_bits = padded.reshape(n_seg0, seg0).sum(axis=1)
            meta = jnp.concatenate(
                [
                    (ovf | ovf2).astype(jnp.int32)[None],
                    jnp.sum(lens, dtype=jnp.int32)[None],
                    seg_bits,
                ]
            )
            return out, meta

    else:
        def fn(pixels, dc_sizes, dc_codes, ac_sizes, ac_codes):
            streams = inner(pixels)
            if version == "v2":
                dc_p, ac_p = _pack_tables_jnp(
                    dc_sizes, dc_codes, ac_sizes, ac_codes
                )
                return _pack_scans_v2(
                    streams, scan_plan, dc_p, ac_p, budget, interpret, cm=cm
                )
            return _pack_scans(
                streams, scan_plan, None,
                (dc_sizes, dc_codes, ac_sizes, ac_codes), budget,
            )

    if layout["interleaved"]:
        block_counts = [len(layout["mcu_block_comps"]) * layout["mcu_count"]]
    else:
        block_counts = list(layout["comp_block_counts"])

    seg_structure = [
        _n_segments(block_counts[si], spec.seg_blocks)
        for si, spec, _ in scan_plan
    ]
    jitted = jax.jit(fn)
    jitted.raw_fn = fn  # untraced body (bench loops it in-jit)
    return jitted, scan_plan, seg_structure


@lru_cache(maxsize=32)
def _build_pack_only_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
    version: str = "v1",
    cm: bool = False,
):
    """Packing stage alone: jit(streams..., tables...) -> (buf, meta).
    Used for the two-pass optimized-table flow where coefficients already
    live on device.  ``cm=True`` expects coefficient-major (64, B) streams
    (the layout :func:`_build_coeff_hist_fn` produces on the Pallas path)."""
    from ..kernels.pipeline import scan_layout

    layout = scan_layout(width, height, color_type, config)
    components = layout["components"]
    scan_plan = build_scan_plan(layout, components, config)
    interpret = jax.default_backend() != "tpu"

    def fn(streams, dc_sizes, dc_codes, ac_sizes, ac_codes):
        if version == "v2":
            dc_p, ac_p = _pack_tables_jnp(
                dc_sizes, dc_codes, ac_sizes, ac_codes
            )
            return _pack_scans_v2(
                streams, scan_plan, dc_p, ac_p, budget, interpret, cm=cm
            )
        return _pack_scans(
            streams, scan_plan, None,
            (dc_sizes, dc_codes, ac_sizes, ac_codes), budget,
        )

    if layout["interleaved"]:
        block_counts = [len(layout["mcu_block_comps"]) * layout["mcu_count"]]
    else:
        block_counts = list(layout["comp_block_counts"])
    seg_structure = [
        _n_segments(block_counts[si], spec.seg_blocks)
        for si, spec, _ in scan_plan
    ]
    jitted = jax.jit(fn)
    jitted.raw_fn = fn
    return jitted, scan_plan, seg_structure


@lru_cache(maxsize=32)
def _build_coeff_hist_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
):
    """jit(pixels) -> (comp_streams, histograms) with everything staying on
    device.  First pass of the optimized-table flow; in the sharded path the
    histograms are additionally psum-reduced over the mesh.

    Returns ``(fn, components, cm)``: on the Pallas+v2 path the whole pass
    runs coefficient-major — streams come back as (64, B) arrays and the
    histograms reduce along the lane axis in place (measured 3-19 ms saved
    per 3.6 MP vs the block-major layout's transposes) — and the caller
    must pack them with ``_build_pack_only_fn(..., cm=True)``."""
    from ..kernels.pipeline import _build_coefficients_fn, scan_layout
    from .device import scan_histograms

    layout = scan_layout(width, height, color_type, config)
    components = layout["components"]
    coeff_fn, _ = _build_coefficients_fn(width, height, color_type, config, False)
    cm = pack_version() == "v2" and coeff_fn.raw_fn_cm is not None
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn

    def fn(pixels):
        streams = inner(pixels)
        hists = scan_histograms(
            streams, components, config.progressive_scans, cm=cm
        )
        return streams, hists

    jitted = jax.jit(fn)
    jitted.raw_fn = fn
    return jitted, components, cm


@lru_cache(maxsize=64)
def _slice_fn(bucket: int):
    """Cached static-size prefix-slice program; avoids recompiling a new
    executable for every distinct output length."""
    return jax.jit(lambda b: jax.lax.dynamic_slice(b, (0,), (bucket,)))


def _bucket(total: int) -> int:
    """Round up to ~12.5% geometric steps (few distinct compile shapes,
    bounded extra transfer)."""
    if total <= 65536:
        return 65536
    granule = 1 << (max(total, 8) - 1).bit_length() - 3
    return -(-total // granule) * granule


def fetch_bytes(buf, total: int) -> np.ndarray:
    """Transfer the first ``total`` bytes of a device buffer using a
    bucketed static-shape slice."""
    bucket = min(_bucket(total), buf.shape[0])
    if bucket >= buf.shape[0]:
        return np.asarray(buf)[:total]
    return np.asarray(_slice_fn(bucket)(buf))[:total]


# (key) -> high-water output element count, learned across calls so the
# output slice can be dispatched concurrently with the metadata fetch
# (one tunnel round trip instead of two).  Same bound policy as the
# budget memo.
_size_memo: OrderedDict = OrderedDict()


def _size_memo_put(key, total: int) -> None:
    prev = _size_memo.get(key, 0)
    if total > prev:
        if key in _size_memo:
            _size_memo.move_to_end(key)
        elif len(_size_memo) >= _BUDGET_MEMO_MAX:
            _size_memo.popitem(last=False)
        _size_memo[key] = total


def speculate_fetch(buf, key):
    """Dispatch (async) a bucketed output slice sized from the memoized
    high-water mark for ``key``, BEFORE the metadata round trip resolves
    the true length.  Returns ``(device_slice, bucket)`` or ``None`` when
    no history exists."""
    guess = _size_memo.get(key)
    if not guess:
        return None
    bucket = min(_bucket(guess), buf.shape[0])
    if bucket >= buf.shape[0]:
        return buf, int(buf.shape[0])
    return _slice_fn(bucket)(buf), bucket


def resolve_fetch(spec, buf, total: int, key) -> np.ndarray:
    """Fetch the first ``total`` elements, using the speculative slice when
    it covers the true length; otherwise fall back to a fresh fetch."""
    _size_memo_put(key, total)
    if spec is not None:
        arr, bucket = spec
        if total <= bucket:
            return np.asarray(arr)[:total]
    return fetch_bytes(buf, total)


def tables_to_arrays(huffman) -> Tuple[np.ndarray, ...]:
    """[(dc, ac) per table id] -> four (T, 256) uint32 lookup arrays."""
    T = len(huffman)
    dc_sizes = np.zeros((T, 256), np.uint32)
    dc_codes = np.zeros((T, 256), np.uint32)
    ac_sizes = np.zeros((T, 256), np.uint32)
    ac_codes = np.zeros((T, 256), np.uint32)
    for i, (dc, ac) in enumerate(huffman):
        if dc is not None:
            dc_sizes[i] = dc.sizes
            dc_codes[i] = dc.codes
        if ac is not None:
            ac_sizes[i] = ac.sizes
            ac_codes[i] = ac.codes
    return dc_sizes, dc_codes, ac_sizes, ac_codes


_device_tables_cache: dict = {}


def tables_to_device(huffman):
    """Device-resident table arrays, cached by table identity so repeated
    encodes skip the per-call host->device table upload."""
    key = tuple(
        (id(dc), id(ac)) for dc, ac in huffman
    )
    hit = _device_tables_cache.get(key)
    if hit is None:
        arrays = tables_to_arrays(huffman)
        hit = tuple(jax.device_put(a) for a in arrays)
        if len(_device_tables_cache) > 64:
            _device_tables_cache.clear()
        _device_tables_cache[key] = hit
    return hit


def _finish_scans(buf_np, meta_np, scan_plan, seg_structure) -> List[bytes]:
    """Split the device buffer into stuffed, marker-interleaved scans."""
    n_scans = len(scan_plan)
    scan_bits = meta_np[1 : 1 + n_scans]
    seg_bits = meta_np[1 + n_scans :]
    scans = []
    byte_off = 0
    seg_off = 0
    for i in range(n_scans):
        nbytes = int(scan_bits[i]) >> 3
        nseg = seg_structure[i]
        segs = seg_bits[seg_off : seg_off + nseg] >> 3
        seg_off += nseg
        data = buf_np[byte_off : byte_off + nbytes].tobytes()
        byte_off += nbytes
        stuffed = native.stuff_segments(data, segs)
        if stuffed is None:
            stuffed = native.stuff_segments_py(data, segs.tolist())
        scans.append(stuffed)
    return scans


@lru_cache(maxsize=32)
def _build_fused_batch_fn(
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    budget: int,
    n_images: int,
    version: str = "v1",
):
    """Whole-batch fused program: (N, H, W, C) pixels -> one packed buffer.

    All N images ride one interleaved scan_pack call whose segment
    structure is per-image (or the restart interval within each image);
    image boundaries are therefore byte-aligned DC-reset points and host
    assembly just splits the buffer — one dispatch and two fetches for the
    entire batch.
    """
    from ..kernels.pipeline import _build_coefficients_fn, scan_layout

    layout = scan_layout(width, height, color_type, config)
    assert layout["interleaved"]
    components = layout["components"]
    scan_plan = build_scan_plan(layout, components, config)
    (_, spec, _), = scan_plan
    bpm = len(layout["mcu_block_comps"])
    blocks_per_image = layout["mcu_count"] * bpm

    interval_blocks = (config.restart_interval or 0) * bpm
    if interval_blocks and blocks_per_image % interval_blocks:
        return None  # ragged segments across images: unsupported
    seg = interval_blocks if interval_blocks else blocks_per_image
    segs_per_image = blocks_per_image // seg
    spec = spec._replace(seg_blocks=seg)

    coeff_fn, _ = _build_coefficients_fn(
        width, height, color_type, config, True
    )
    cm = version == "v2" and coeff_fn.raw_fn_cm is not None
    inner = coeff_fn.raw_fn_cm if cm else coeff_fn.raw_fn

    interpret = jax.default_backend() != "tpu"

    def fn(pixels, dc_sizes, dc_codes, ac_sizes, ac_codes):
        streams = inner(pixels)  # ((N, B_img, 64),) or cm ((64, N*B_img),)
        blocks = streams[0] if cm else streams[0].reshape(-1, 64)
        if version == "v2":
            from .pallas_pack import device_scan_pack

            dc_p, ac_p = _pack_tables_jnp(
                dc_sizes, dc_codes, ac_sizes, ac_codes
            )
            stream, bits, lens, ovf = device_scan_pack(
                blocks, spec, dc_p, ac_p, budget, interpret=interpret,
                cm=cm,
            )
            Btot = blocks.shape[1] if cm else blocks.shape[0]
            n_seg = -(-Btot // seg)
            padded = jnp.pad(lens[:Btot], (0, n_seg * seg - Btot))
            seg_bits = padded.reshape(n_seg, seg).sum(axis=1)
            meta = jnp.concatenate(
                [ovf.astype(jnp.int32)[None], bits[None], seg_bits]
            )
            return stream, meta
        words, bits, seg_bits, ovf = scan_pack(
            blocks, spec, dc_sizes, dc_codes, ac_sizes, ac_codes, budget
        )
        data = words_to_bytes(words)
        meta = jnp.concatenate(
            [ovf.astype(jnp.int32)[None], bits[None], seg_bits]
        )
        return data, meta

    return jax.jit(fn), scan_plan, segs_per_image


def device_encode_batch_fused(
    pixels: np.ndarray,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
) -> Optional[List[List[bytes]]]:
    """Single-program batch encode (interleaved mode).  Returns per-image
    scan payload lists or None to fall back."""
    if config.mode() != "interleaved" or config.optimize_huffman_table:
        return None
    n = pixels.shape[0]
    # Keep the packing tree's intermediate memory bounded (~1KB/block).
    if n * (width // 8 + 1) * (height // 8 + 1) > 3_000_000:
        return None
    version = pack_version()
    key = ("batch", width, height, color_type, config, n, version)
    tabs = tables_to_device(huffman)

    budgets = list(BUDGET_LADDER)
    if key in _budget_memo:
        budgets = [b for b in budgets if b >= _budget_memo[key]]
    for budget in budgets:
        built = _build_fused_batch_fn(
            width, height, color_type, config, budget, n, version
        )
        if built is None:
            return None
        fn, scan_plan, segs_per_image = built
        buf, meta = fn(pixels, *tabs)
        spec = speculate_fetch(buf, key)
        meta_np = np.asarray(meta)
        if meta_np[0]:
            continue
        _memo_put(key, budget)
        if version == "v2":
            total_words = (int(meta_np[1]) + 31) >> 5
            buf_np = resolve_fetch(spec, buf, total_words, key)
            seg_bits = meta_np[2:].astype(np.int64)
            data = buf_np[:total_words].astype(">u4").tobytes()
            out = []
            bit_off = 0
            for i in range(n):
                segs = seg_bits[i * segs_per_image : (i + 1) * segs_per_image]
                stuffed = native.realign_segments(
                    data, segs, bit_offset=bit_off
                )
                if stuffed is None:
                    stuffed = native.realign_segments_py(
                        data, segs.tolist(), bit_offset=bit_off
                    )
                out.append([stuffed])
                bit_off += int(segs.sum())
            return out
        seg_bytes = meta_np[2:] >> 3
        buf_np = resolve_fetch(spec, buf, int(meta_np[1]) >> 3, key)
        out = []
        off = 0
        for i in range(n):
            segs = seg_bytes[i * segs_per_image : (i + 1) * segs_per_image]
            total = int(segs.sum())
            data = buf_np[off : off + total].tobytes()
            off += total
            stuffed = native.stuff_segments(data, segs)
            if stuffed is None:
                stuffed = native.stuff_segments_py(data, segs.tolist())
            out.append([stuffed])
        return out
    return None


def device_encode_batch(
    images,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
) -> Optional[List[List[bytes]]]:
    """Pipelined batch encode: dispatch every image's fused program before
    fetching any result, so H2D, compute and D2H overlap across images.

    Only supported for default-table (single-pass) modes; returns a list of
    per-image scan-payload lists, or None to fall back.
    """
    if config.optimize_huffman_table:
        return None
    version = pack_version()
    key = (width, height, color_type, config, version)
    tabs = tables_to_device(huffman)
    budget = _budget_memo.get(key, BUDGET_LADDER[0])

    fn, scan_plan, seg_structure = _build_fused_fn(
        width, height, color_type, config, budget, version
    )
    n_scans = len(scan_plan)

    # Dispatch phase — queue all uploads first (async), then all programs,
    # so H2D, compute and D2H overlap across images.
    device_images = [jax.device_put(img) for img in images]
    pending = [fn(img, *tabs) for img in device_images]
    specs = [speculate_fetch(buf, key) for buf, _ in pending]

    out: List[Optional[List[bytes]]] = []
    retry: List[int] = []
    for i, (buf, meta) in enumerate(pending):
        meta_np = np.asarray(meta)
        if meta_np[0]:
            out.append(None)
            retry.append(i)
            continue
        if version == "v2":
            total = int(np.sum(meta_np[1 : 1 + n_scans]) + 31) >> 5
            buf_np = resolve_fetch(specs[i], buf, total, key)
            out.append(
                _finish_scans_v2(buf_np, meta_np, scan_plan, seg_structure)
            )
        else:
            total = int(np.sum(meta_np[1 : 1 + n_scans]) >> 3)
            buf_np = resolve_fetch(specs[i], buf, total, key)
            out.append(
                _finish_scans(buf_np, meta_np, scan_plan, seg_structure)
            )
    if key not in _budget_memo:
        _memo_put(key, budget)

    for i in retry:
        scans = device_encode_scans(
            images[i], width, height, color_type, config, huffman
        )
        if scans is None:
            return None
        out[i] = scans
    return out  # type: ignore[return-value]


def device_encode_scans(
    pixels,
    width: int,
    height: int,
    color_type: ColorType,
    config: EncoderConfig,
    huffman,
    comp_streams=None,
    comp_streams_cm: bool = False,
    budget_hint: int = 0,
) -> Optional[List[bytes]]:
    """Encode all scans on device; returns the per-scan entropy byte strings
    (stuffed, with RST markers) in scan order, or None if the device path
    declines (pathological overflow).  ``comp_streams_cm`` says the given
    streams are coefficient-major (64, B).  ``budget_hint`` (optional,
    words/row) starts the ladder at the first rung that covers it — the
    optimized-table flow computes it exactly from the first-pass
    histograms (``huffopt.exact_stream_bits``), skipping overflow probes
    on first encounter; a learned memo entry takes precedence."""
    version = pack_version()
    key = (width, height, color_type, config, version)
    tabs = tables_to_device(huffman)

    budgets = list(BUDGET_LADDER)
    if key in _budget_memo:
        budgets = [b for b in budgets if b >= _budget_memo[key]]
    elif budget_hint > 0:
        covering = [b for b in budgets if b >= budget_hint]
        budgets = covering or [budgets[-1]]

    for budget in budgets:
        if comp_streams is None:
            fn, scan_plan, seg_structure = _build_fused_fn(
                width, height, color_type, config, budget, version
            )
            buf, meta = fn(pixels, *tabs)
        else:
            fn, scan_plan, seg_structure = _build_pack_only_fn(
                width, height, color_type, config, budget, version,
                cm=comp_streams_cm,
            )
            buf, meta = fn(tuple(comp_streams), *tabs)

        spec = speculate_fetch(buf, key)
        meta_np = np.asarray(meta)
        if meta_np[0]:  # overflow — escalate budget
            continue
        _memo_put(key, budget)
        n_scans = len(scan_plan)
        if version == "v2":
            if _use_device_stuff():
                scans = _finish_scans_v2_device(
                    buf, meta_np, scan_plan, seg_structure
                )
                if scans is not None:
                    return scans
            total_words = int(np.sum(meta_np[1 : 1 + n_scans]) + 31) >> 5
            buf_np = resolve_fetch(spec, buf, total_words, key)
            return _finish_scans_v2(buf_np, meta_np, scan_plan, seg_structure)
        total_bytes = int(np.sum(meta_np[1 : 1 + n_scans]) >> 3)
        buf_np = resolve_fetch(spec, buf, total_bytes, key)
        return _finish_scans(buf_np, meta_np, scan_plan, seg_structure)
    return None
