"""Mesh-sharded end-to-end encode.

Combines the MCU-row-stripe coefficient pipeline (``shard.stripes``) with
the entropy/assembly layers to produce complete JFIF files from a
multi-device mesh — the multi-host scaling surface the reference (strictly
single-process, SURVEY §2) never had:

* pixels are striped over the ``stripe`` axis and data-paralleled over
  ``batch``;
* each device computes its stripe's quantized blocks (and, for optimized
  tables, its psum-contribution to the Huffman histograms);
* only coefficient blocks (or on a real pod: per-segment bitstreams and
  lengths) leave the device; entropy packing + JFIF assembly run on host.

On a real pod slice each host would fetch only its addressable shards and
the byte concatenation would ride ``jax.experimental.multihost_utils``;
on one host this path is exercised end-to-end on a virtual device mesh.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from jax.sharding import Mesh

from ..api import Encoder
from ..core.types import ColorType
from .stripes import pad_for_stripes, stripe_encode_step, stripe_geometry


def fetch_global(arr) -> np.ndarray:
    """Host fetch of a (possibly multi-host-sharded) mesh output.

    Single-process (every shard addressable): a plain ``np.asarray``.
    Multi-process (a real pod slice, ``jax.process_count() > 1``): the
    array's shards span hosts and are not locally addressable, so the
    bytes ride ``multihost_utils.process_allgather``, which fully
    replicates a non-fully-addressable ``jax.Array`` to every process
    (the SURVEY §5 distributed-comm prescription: collectives on device,
    ``multihost_utils`` for the final host byte gather).  Set
    ``TPUENC_FORCE_MULTIHOST_GATHER=1`` to exercise this path under a
    single process (used by tests; real multi-host runs need no flag).
    """
    import os

    import jax

    if (
        jax.process_count() > 1
        or os.environ.get("TPUENC_FORCE_MULTIHOST_GATHER") == "1"
    ):
        from jax.experimental import multihost_utils

        out = np.asarray(multihost_utils.process_allgather(arr))
        # Non-fully-addressable inputs (mesh outputs on a real pod) come
        # back fully replicated at the original shape; fully-addressable
        # ones (forced single-process mode, or replicated arrays) come
        # back stacked with a per-process leading axis — every copy is
        # the same array, take one.
        if out.shape == (jax.process_count(),) + tuple(np.shape(arr)):
            out = out[0]
        return out
    return np.asarray(arr)


class ShardedEncoder(Encoder):
    """Encoder whose pixels->coefficients stage runs striped over a mesh.

    Same configuration surface as :class:`tpuenc.Encoder`; ``encode``
    accepts a (H, W, C) image (or (B, H, W, C) batch via
    :meth:`encode_batch_sharded`).
    """

    def __init__(self, quality: int, mesh: Mesh):
        super().__init__(quality)
        self._mesh = mesh

    def encode(self, data, width, height, color_type: ColorType) -> bytes:
        outs = self.encode_batch_packed([data], width, height, color_type)
        if outs is None:
            outs = self.encode_batch_packed_general(
                [data], width, height, color_type
            )
        if outs is None:
            outs = self.encode_batch_sharded(
                [data], width, height, color_type
            )
        return outs[0]

    def encode_batch_packed_general(
        self, images, width: int, height: int, color_type: ColorType
    ) -> Optional[List[bytes]]:
        """Fully sharded entropy for EVERY mode: each stripe packs its
        portion of every scan on its device (raw bitstreams, mid-stream
        DC chains via ppermute, global restart geometry); the host
        bit-concatenates and realigns.  Lifts the interleaved +
        restart-aligned restriction of :meth:`encode_batch_packed`.

        Requires MCU-aligned dimensions and exactly one image per batch
        mesh coordinate; returns None otherwise (caller falls back to the
        host-packed path)."""
        from ..core.tables import default_tables, quantization_table
        from ..core.types import JpegColorType, init_components
        from ..entropy import native
        from ..entropy.chunked import BitAccumulator
        from ..entropy.device_encode import (
            BUDGET_LADDER,
            _budget_memo,
            _memo_put,
        )
        from ..entropy.huffopt import tables_from_histograms
        from ..entropy.pallas_pack import pack_tables
        from ..jfif import markers, segments
        from .stripes import _build_general_pack_fn

        color_type = ColorType(color_type)
        config = self._config()
        n_b = self._mesh.shape["batch"]
        n_s = self._mesh.shape["stripe"]
        geo = stripe_geometry(width, height, color_type, config, n_s)
        if width % (8 * geo["max_h"]) or height % (8 * geo["max_v"]):
            return None

        pixels = np.stack(
            [np.asarray(im, dtype=np.uint8).reshape(height, width, -1)
             for im in images]
        )
        if color_type is ColorType.LUMA:
            pixels = pixels[..., 0]
        if pixels.shape[0] != n_b:
            return None  # one image per batch mesh coordinate

        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        q_tables = [
            quantization_table(config.quantization[0], config.quality, True),
            quantization_table(config.quantization[1], config.quality, False),
        ]

        # Per-image Huffman tables (optimized via the device psum
        # histograms, default K.3 otherwise), packed per batch coordinate.
        default = [list(pair) for pair in default_tables()]
        per_image_huffman = [list(list(p) for p in default) for _ in range(n_b)]
        if config.optimize_huffman_table:
            hfn, hgeo = stripe_encode_step(
                width, height, color_type, config, self._mesh,
                with_histograms=True,
            )
            _, hists = hfn(pad_for_stripes(
                pixels, hgeo, channels=color_type is not ColorType.LUMA
            ))
            hists_np = [(fetch_global(dc), fetch_global(ac)) for dc, ac in hists]
            for b in range(n_b):
                optimized = tables_from_histograms(
                    [(dc[b], ac[b]) for dc, ac in hists_np]
                )
                for t, pair in enumerate(optimized):
                    per_image_huffman[b][t] = list(pair)

        dcp_list, acp_list = [], []
        for b in range(n_b):
            from ..entropy.device_encode import tables_to_device

            tabs = tables_to_device(per_image_huffman[b])
            dcp, acp = pack_tables(tuple(np.asarray(t) for t in tabs))
            dcp_list.append(np.asarray(dcp))
            acp_list.append(np.asarray(acp))
        dc_packed = np.stack(dcp_list)   # (B, 1, 128)
        ac_packed = np.stack(acp_list)   # (B, T, 256)

        rows_local = geo["rows_per_stripe"]
        num_rows = geo["num_rows"]

        # Learned-budget memo (mirrors device_encode._budget_memo): start
        # the ladder at the rung that worked last time for this
        # (shape, config, mesh) so steady-state calls skip the overflow
        # escalation round trips.
        memo_key = (
            "sharded-general", width, height, color_type, config,
            n_b, n_s,
        )
        budgets = list(BUDGET_LADDER)
        if memo_key in _budget_memo:
            budgets = [b for b in budgets if b >= _budget_memo[memo_key]]
        for budget in budgets:
            fn, geo, plan, local_counts = _build_general_pack_fn(
                width, height, color_type, config, self._mesh, budget
            )
            padded = pad_for_stripes(
                pixels, geo, channels=color_type is not ColorType.LUMA
            )
            outs = fn(padded, dc_packed, ac_packed)

            per_scan = []
            overflow = False
            for (stream, meta, lens) in outs:
                meta_np = fetch_global(meta)
                if meta_np[..., 0].any():
                    overflow = True
                    break
                per_scan.append(
                    (fetch_global(stream), meta_np, fetch_global(lens))
                )
            if overflow:
                continue
            _memo_put(memo_key, budget)

            results = []
            for b in range(n_b):
                payloads = []
                for (stream_np, meta_np, lens_np), n_local, (_, spec, _) in (
                    zip(per_scan, local_counts, plan)
                ):
                    per_row = n_local // rows_local
                    acc = BitAccumulator()
                    lens_list = []
                    for s in range(n_s):
                        valid_s = max(
                            0, min(num_rows - s * rows_local, rows_local)
                        ) * per_row
                        acc.append_words(
                            stream_np[b, s], int(meta_np[b, s, 1])
                        )
                        lens_list.append(
                            lens_np[b, s, :valid_s].astype(np.int64)
                        )
                    lens_all = np.concatenate(lens_list)
                    total_real = lens_all.size
                    seg = spec.seg_blocks if spec.seg_blocks > 0 else total_real
                    n_seg = -(-total_real // seg)
                    pad_n = n_seg * seg - total_real
                    seg_bits = np.pad(lens_all, (0, pad_n)).reshape(
                        n_seg, seg
                    ).sum(axis=1)
                    data = bytes(acc.buf)
                    stuffed = native.realign_segments(data, seg_bits)
                    if stuffed is None:
                        stuffed = native.realign_segments_py(
                            data, seg_bits.tolist()
                        )
                    payloads.append(stuffed)

                out = bytearray()
                out += segments.marker(markers.SOI)
                out += segments.app0_jfif(config.density)
                if jct is JpegColorType.CMYK:
                    out += segments.app14_adobe(0)
                elif jct is JpegColorType.YCCK:
                    out += segments.app14_adobe(2)
                for nr, d in self._app_segments:
                    out += segments.segment(markers.APP(nr), d)
                out += self._assemble_scans(
                    payloads, width, height, color_type, config,
                    components, q_tables, per_image_huffman[b],
                )
                out += segments.marker(markers.EOI)
                results.append(bytes(out))
            return results
        return None

    def encode_batch_packed(
        self, images, width: int, height: int, color_type: ColorType
    ) -> Optional[List[bytes]]:
        """Fully sharded encode: every stripe packs its own bitstream on
        its device; the host only stuffs and concatenates byte-aligned
        restart segments with globally-numbered RST markers.

        Requires interleaved mode with a restart interval dividing each
        stripe's MCU count and stripe-exact geometry (MCU-aligned
        dimensions, MCU rows divisible by the stripe count).  Returns None
        when those conditions don't hold so the caller can fall back.
        """
        from ..core.tables import default_tables, quantization_table
        from ..core.types import JpegColorType, init_components
        from ..entropy import native
        from ..entropy.device_encode import tables_to_device
        from ..jfif import markers, segments
        from .stripes import _build_stripe_pack_fn

        color_type = ColorType(color_type)
        config = self._config()
        if config.mode() != "interleaved" or not config.restart_interval:
            return None

        n_b = self._mesh.shape["batch"]
        n_s = self._mesh.shape["stripe"]
        geo = stripe_geometry(width, height, color_type, config, n_s)
        if (
            width % (8 * geo["max_h"])
            or height % (8 * geo["max_v"])
            or geo["num_rows"] % n_s
        ):
            return None
        mcus_local = geo["rows_per_stripe"] * geo["num_cols"]
        if mcus_local % config.restart_interval:
            return None

        pixels = np.stack(
            [np.asarray(im, dtype=np.uint8).reshape(height, width, -1)
             for im in images]
        )
        if color_type is ColorType.LUMA:
            pixels = pixels[..., 0]
        if pixels.shape[0] != n_b:
            return None  # local batch must be exactly the batch axis

        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        q_tables = [
            quantization_table(config.quantization[0], config.quality, True),
            quantization_table(config.quantization[1], config.quality, False),
        ]
        huffman = [list(pair) for pair in default_tables()]
        tabs = tables_to_device(huffman)

        fn, geo, spec = _build_stripe_pack_fn(
            width, height, color_type, config, self._mesh, 48
        )
        padded = pad_for_stripes(
            pixels, geo, channels=color_type is not ColorType.LUMA
        )
        data, meta = fn(padded, *tabs)
        meta_np = fetch_global(meta)
        if meta_np[..., 0].any():
            return None  # budget overflow: fall back
        data_np = fetch_global(data)

        n_seg_local = mcus_local // config.restart_interval
        results = []
        for b in range(n_b):
            payload = bytearray()
            global_seg = 0
            for s in range(n_s):
                bits = int(meta_np[b, s, 1])
                seg_bits = meta_np[b, s, 2 : 2 + n_seg_local]
                raw = data_np[b, s, : bits >> 3].tobytes()
                off = 0
                for sb in seg_bits:
                    nbytes = int(sb) >> 3
                    seg = raw[off : off + nbytes]
                    off += nbytes
                    if global_seg > 0:
                        payload += bytes(
                            (0xFF, 0xD0 + ((global_seg - 1) & 7))
                        )
                    stuffed = native.stuff_segments(seg, [nbytes])
                    if stuffed is None:
                        stuffed = native.stuff_segments_py(seg, [nbytes])
                    payload += stuffed
                    global_seg += 1

            out = bytearray()
            out += segments.marker(markers.SOI)
            out += segments.app0_jfif(config.density)
            if jct is JpegColorType.CMYK:
                out += segments.app14_adobe(0)
            elif jct is JpegColorType.YCCK:
                out += segments.app14_adobe(2)
            for nr, d in self._app_segments:
                out += segments.segment(markers.APP(nr), d)
            out += self._frame_header(
                width, height, components, q_tables, huffman, config,
                len(components),
            )
            out += segments.sos(list(components))
            out += payload
            out += segments.marker(markers.EOI)
            results.append(bytes(out))
        return results

    def encode_batch_sharded(
        self, images, width: int, height: int, color_type: ColorType
    ) -> List[bytes]:
        from ..core import errors
        from ..core.tables import default_tables, quantization_table
        from ..core.types import JpegColorType, init_components
        from ..entropy.huffopt import tables_from_histograms
        from ..jfif import markers, segments

        color_type = ColorType(color_type)
        if width == 0 or height == 0:
            raise errors.ZeroImageDimensions(width, height)
        bpp = color_type.bytes_per_pixel
        required = width * height * bpp

        batch = []
        for data in images:
            flat = (
                np.frombuffer(data, dtype=np.uint8)
                if isinstance(data, (bytes, bytearray, memoryview))
                else np.asarray(data, dtype=np.uint8).reshape(-1)
            )
            if flat.size < required:
                raise errors.BadImageData(flat.size, required)
            px = flat[:required].reshape(height, width, bpp)
            if bpp == 1:
                px = px[..., 0]
            batch.append(px)
        pixels = np.stack(batch)

        config = self._config()
        n_b = self._mesh.shape["batch"]
        if pixels.shape[0] % n_b != 0:
            raise ValueError(
                f"batch {pixels.shape[0]} not divisible by mesh batch axis {n_b}"
            )

        # Two-pass optimized tables use the on-device psum histograms
        # (stripes.py): per-shard counts are reduced over the stripe axis
        # on device; only (B, 2, 2, 257) counts reach the host for the
        # tiny serial K.2 build.
        want_hists = bool(config.optimize_huffman_table)
        fn, geo = stripe_encode_step(
            width, height, color_type, config, self._mesh,
            with_histograms=want_hists,
        )
        padded = pad_for_stripes(pixels, geo, channels=bpp != 1)
        if want_hists:
            streams, hists = fn(padded)
            hists_np = [
                (fetch_global(dc), fetch_global(ac)) for dc, ac in hists
            ]
        else:
            streams = fn(padded)

        # The striped path requires component block grids to coincide with
        # the stripe grids, i.e. width/height multiples of the MCU size
        # (otherwise the single-device path applies).
        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        max_h = geo["max_h"]
        max_v = geo["max_v"]
        if width % (8 * max_h) or height % (8 * max_v):
            raise ValueError(
                "sharded encode requires MCU-aligned dimensions "
                f"(multiples of {8*max_h}x{8*max_v}); got {width}x{height}"
            )
        q_tables = [
            quantization_table(config.quantization[0], config.quality, True),
            quantization_table(config.quantization[1], config.quality, False),
        ]

        # Trim blocks contributed by stripe-alignment padding MCU rows
        # (always at the stream tail).
        from ..kernels.pipeline import scan_layout

        layout = scan_layout(width, height, color_type, config)
        if layout["interleaved"]:
            real_counts = [
                layout["mcu_count"] * len(layout["mcu_block_comps"])
            ]
        else:
            real_counts = list(layout["comp_block_counts"])

        results = []
        np_streams = [fetch_global(s) for s in streams]
        for i in range(pixels.shape[0]):
            comp_blocks = [
                s[i][:n] for s, n in zip(np_streams, real_counts)
            ]
            huffman = [list(pair) for pair in default_tables()]
            if want_hists:
                optimized = tables_from_histograms(
                    [(dc[i], ac[i]) for dc, ac in hists_np]
                )
                for t, pair in enumerate(optimized):
                    huffman[t] = list(pair)

            out = bytearray()
            out += segments.marker(markers.SOI)
            out += segments.app0_jfif(config.density)
            if jct is JpegColorType.CMYK:
                out += segments.app14_adobe(0)
            elif jct is JpegColorType.YCCK:
                out += segments.app14_adobe(2)
            for nr, data in self._app_segments:
                out += segments.segment(markers.APP(nr), data)

            scans = self._host_scans_from_streams(
                comp_blocks, width, height, color_type, config, components,
                huffman,
            )
            out += self._assemble_scans(
                scans, width, height, color_type, config, components,
                q_tables, huffman,
            )
            out += segments.marker(markers.EOI)
            results.append(bytes(out))
        return results

    def _host_scans_from_streams(
        self, comp_blocks, width, height, color_type, config, components,
        huffman,
    ):
        from ..entropy.device_encode import build_scan_plan
        from ..kernels.pipeline import scan_layout

        from .. import api as _api

        layout = scan_layout(width, height, color_type, config)
        plan = build_scan_plan(layout, components, config)
        scans = []
        for stream_idx, spec, _ in plan:
            blocks = comp_blocks[stream_idx]
            if layout["interleaved"]:
                comp_ids = np.tile(
                    np.asarray(layout["mcu_block_comps"], np.int32),
                    layout["mcu_count"],
                )
                dc_tabs = [huffman[c.dc_huffman_table][0] for c in components]
                ac_tabs = [huffman[c.ac_huffman_table][1] for c in components]
            else:
                comp_ids = None
                comp = components[stream_idx]
                dc_tabs = [huffman[comp.dc_huffman_table][0]]
                ac_tabs = [huffman[comp.ac_huffman_table][1]]
            scans.append(
                _api._pack_scan(
                    blocks, comp_ids, dc_tabs, ac_tabs,
                    restart_interval_blocks=spec.seg_blocks,
                    spectral_start=spec.spectral_start,
                    spectral_end=spec.spectral_end,
                    emit_dc=spec.emit_dc,
                    emit_ac=spec.emit_ac,
                )
            )
        return scans


def sharded_encode(
    image,
    width: int,
    height: int,
    color_type: ColorType,
    mesh: Mesh,
    quality: int = 90,
    configure=None,
) -> bytes:
    """One-shot striped encode of a single image over ``mesh``."""
    enc = ShardedEncoder(quality, mesh)
    if configure is not None:
        configure(enc)
    return enc.encode(image, width, height, color_type)
