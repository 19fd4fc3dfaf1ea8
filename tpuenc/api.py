"""Public encoder API.

Mirrors the reference's user-facing surface 1:1
(``/root/reference/src/encoder.rs:212-567`` + ``lib.rs:45-69``): an
``Encoder`` with the same constructor semantics (quality 1-100; quality < 90
defaults to 2x2 / 4:2:0 subsampling), every setter, APP/ICC/EXIF metadata
embedding, and ``encode`` / ``encode_image`` / ``new_file`` entry points —
re-architected so that pixels -> quantized coefficients runs as one jitted
TPU program (``kernels.pipeline``) and entropy coding runs in the native
multithreaded packer (``entropy.native``) with a byte-exact Python oracle
fallback.
"""

from __future__ import annotations

import abc
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .core import errors
from .core.tables import (
    HuffmanTable,
    QuantizationTable,
    default_tables,
    quantization_table,
)
from .core.types import (
    ColorType,
    Component,
    EncoderConfig,
    JpegColorType,
    PixelDensity,
    SamplingFactor,
    init_components,
    max_sampling,
)
from .entropy import native as native_entropy
from .entropy.bitpack import encode_scan
from .entropy.huffopt import optimize_tables, progressive_bands
from .jfif import markers, segments
from .kernels.pipeline import coefficients_fn

__all__ = ["Encoder", "ImageBuffer", "FALLBACK_COUNTS"]

import logging

_log = logging.getLogger("tpuenc")

# Observability for the device->host fallback boundary: "host" counts
# encodes that landed on the host packer (declines), "error" counts
# device-path exceptions swallowed by the non-strict fallback.  A perf
# regression that silently shifts work to the host shows up here; the
# bench asserts which path ran via ``Encoder.last_encode_path``.
FALLBACK_COUNTS = {"host": 0, "error": 0}

# Above this many blocks the whole-image device packer's intermediates
# (~1KB/block) stop fitting; interleaved encodes switch to the chunked
# streaming path (entropy.chunked), others fall back to the host packer.
DEVICE_BLOCK_LIMIT = 3_000_000

# Cap on the fused program's total (scan x block) pack rows: every scan
# of the plan contributes one packed-word row per block of its feeding
# stream to the shared P2-P4 merge.  12M rows covers the full 2-64
# progressive scan domain at the 3.6 MP bench size (64-scan RGB 4:4:4 =
# ~10.8M rows) while bounding the merge's intermediate memory; bigger
# products stream through the bounded-memory multipass path.
DEVICE_PACK_ROWS_LIMIT = 12_000_000


def _plan_pack_rows(width, height, color_type, config) -> int:
    """Total packed-word rows the fused device program would materialize
    for this config's scan plan (one row per block per scan)."""
    from .kernels.pipeline import scan_layout

    layout = scan_layout(width, height, color_type, config)
    if layout["interleaved"]:
        return len(layout["mcu_block_comps"]) * layout["mcu_count"]
    counts = layout["comp_block_counts"]
    scans_per_comp = 1
    if config.progressive_scans is not None:
        scans_per_comp = config.progressive_scans  # 1 DC + (n-1) AC bands
    return sum(counts) * scans_per_comp


def _check_dims(width: int, height: int) -> None:
    """Reference dimension domain: non-zero (encoder.rs:521-526) and
    within the u16 range its API types enforce (encoder.rs:443-446)."""
    if width == 0 or height == 0:
        raise errors.ZeroImageDimensions(width, height)
    if width > 65535 or height > 65535:
        raise errors.DimensionsTooLarge(width, height)


def _validate_pixels(
    data, width: int, height: int, color_type: ColorType
) -> np.ndarray:
    """Length/dimension validation shared by the encode entry points
    (reference encoder.rs:447-454); returns the (H, W[, C]) pixel array.

    The u16 range check comes first: in the reference it is a type-level
    constraint at the API boundary (encoder.rs:443-446), ahead of any
    data inspection."""
    if width > 65535 or height > 65535:
        raise errors.DimensionsTooLarge(width, height)
    bpp = color_type.bytes_per_pixel
    flat = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)
    ) else np.asarray(data, dtype=np.uint8).reshape(-1)
    required = width * height * bpp
    if flat.size < required:
        raise errors.BadImageData(flat.size, required)
    _check_dims(width, height)
    pixels = flat[:required].reshape(height, width, bpp)
    if bpp == 1:
        pixels = pixels[..., 0]
    return pixels


class ImageBuffer(abc.ABC):
    """User-extensible pixel source (reference image_buffer.rs:86-98).

    Instead of the reference's per-scanline ``fill_buffers`` push model,
    implementations return whole component planes at once — the natural unit
    for a batched TPU pipeline.
    """

    @abc.abstractmethod
    def get_jpeg_color_type(self) -> JpegColorType: ...

    @abc.abstractmethod
    def width(self) -> int: ...

    @abc.abstractmethod
    def height(self) -> int: ...

    @abc.abstractmethod
    def to_planes(self) -> Tuple[np.ndarray, ...]:
        """Per-component (H, W) planes of 0..255 values in JPEG colorspace
        (Luma: 1 plane; Ycbcr: 3; Cmyk/Ycck: 4, already sign-converted)."""

    def color_type(self) -> Optional[ColorType]:
        """Optional input color type of the planes.

        The reference's built-in ``ImageBuffer`` impls do color conversion
        inside ``fill_buffers`` (image_buffer.rs:86-98, 135-204), so a
        user buffer can feed raw RGB rows.  The TPU analog: return a
        :class:`ColorType` here (e.g. ``ColorType.RGB``) and
        ``to_planes()`` may then return planes in THAT input colorspace
        (one per channel, e.g. R, G, B); :meth:`Encoder.encode_image`
        runs the same device color conversion as :meth:`Encoder.encode`.
        The default ``None`` keeps the round-3 contract: planes are
        already in JPEG colorspace."""
        return None


class Encoder:
    """The JPEG encoder (reference encoder.rs:212-435).

    ``Encoder(quality)`` mirrors ``Encoder::new``: quality must be 1..100;
    below 90 the default sampling factor is 2x2 (4:2:0), otherwise 1x1.
    Output is returned as ``bytes`` from :meth:`encode`; ``new_file`` wires
    the result to a path like the reference's ``Encoder::new_file``.
    """

    def __init__(self, quality: int, _path: Optional[str] = None,
                 _writer=None):
        self.quality = int(quality)
        self._sampling_factor = (
            SamplingFactor.F_2_2 if self.quality < 90 else SamplingFactor.F_1_1
        )
        self._density = PixelDensity()
        self._quantization: Tuple[object, object] = ("default", "default")
        self._progressive_scans: Optional[int] = None
        self._restart_interval: Optional[int] = None
        self._optimize_huffman_table = False
        self._app_segments: List[Tuple[int, bytes]] = []
        self._path = _path
        self._writer = _writer
        # Which entropy path produced the last encode() output:
        # "device-v2" / "device-v1" / "device-chunked" / "device-batch" /
        # "host" / None.
        self.last_encode_path: Optional[str] = None

    @classmethod
    def new_file(cls, path, quality: int) -> "Encoder":
        """Encoder writing to a file (reference encoder.rs:1203-1220)."""
        return cls(quality, _path=str(path))

    @classmethod
    def new_writer(cls, writer, quality: int) -> "Encoder":
        """Encoder writing into any object with a ``write(bytes)`` method —
        the analog of the reference's ``JfifWrite`` sink abstraction
        (writer.rs:76-106)."""
        return cls(quality, _writer=writer)

    # ------------------------------------------------------------------
    # Setters (reference encoder.rs:277-435)
    # ------------------------------------------------------------------

    def set_density(self, density: PixelDensity) -> None:
        self._density = density

    def density(self) -> PixelDensity:
        return self._density

    def set_sampling_factor(self, sampling: SamplingFactor) -> None:
        self._sampling_factor = sampling

    def sampling_factor(self) -> SamplingFactor:
        return self._sampling_factor

    def set_quantization_tables(self, luma, chroma) -> None:
        """Preset name (see ``core.tables.QUANT_PRESET_NAMES``) or a custom
        64-entry sequence per table."""
        self._quantization = (_freeze_qspec(luma), _freeze_qspec(chroma))

    def quantization_tables(self):
        return self._quantization

    def set_progressive(self, progressive: bool) -> None:
        self._progressive_scans = 4 if progressive else None

    def set_progressive_scans(self, scans: int) -> None:
        if not 2 <= scans <= 64:
            raise ValueError(f"Invalid number of scans: {scans}")
        self._progressive_scans = scans

    def progressive_scans(self) -> Optional[int]:
        return self._progressive_scans

    def set_restart_interval(self, interval: int) -> None:
        self._restart_interval = None if interval == 0 else int(interval)

    def restart_interval(self) -> Optional[int]:
        return self._restart_interval

    def set_optimized_huffman_tables(self, optimize: bool) -> None:
        self._optimize_huffman_table = bool(optimize)

    def optimized_huffman_tables(self) -> bool:
        return self._optimize_huffman_table

    def add_app_segment(self, segment_nr: int, data: bytes) -> None:
        """Reference encoder.rs:374-383."""
        if segment_nr == 0 or segment_nr > 15:
            raise errors.InvalidAppSegment(segment_nr)
        if len(data) > 65533:
            raise errors.AppSegmentTooLarge(len(data))
        self._app_segments.append((segment_nr, bytes(data)))

    def add_icc_profile(self, data: bytes) -> None:
        """ICC chunking into APP2 (reference encoder.rs:392-417)."""
        icc_marker = b"ICC_PROFILE\0"
        max_chunk = 65535 - 2 - 12 - 2
        num_chunks = -(-len(data) // max_chunk)
        if num_chunks >= 255:
            raise errors.IccTooLarge(len(data))
        for i in range(num_chunks):
            chunk = data[i * max_chunk : (i + 1) * max_chunk]
            payload = icc_marker + bytes((i + 1, num_chunks)) + chunk
            self.add_app_segment(2, payload)

    def add_exif_metadata(self, data: bytes) -> None:
        """EXIF into APP1 (reference encoder.rs:426-435)."""
        self.add_app_segment(1, b"Exif\0\0" + bytes(data))

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------

    def _config(self) -> EncoderConfig:
        return EncoderConfig(
            quality=self.quality,
            sampling_factor=self._sampling_factor,
            quantization=self._quantization,
            progressive_scans=self._progressive_scans,
            restart_interval=self._restart_interval,
            optimize_huffman_table=self._optimize_huffman_table,
            density=self._density,
        )

    def encode(
        self,
        data: Union[bytes, np.ndarray],
        width: int,
        height: int,
        color_type: ColorType,
    ) -> bytes:
        """Encode raw interleaved pixel data (reference encoder.rs:440-503)."""
        color_type = ColorType(color_type)
        pixels = _validate_pixels(data, width, height, color_type)
        return self._finish(self._encode_pixels(pixels, width, height, color_type))

    def encode_stream(
        self,
        data: Union[bytes, np.ndarray],
        width: int,
        height: int,
        color_type: ColorType,
        chunk_mcu_rows: int = 64,
    ):
        """Streaming encode: a generator of byte pieces whose concatenation
        is byte-identical to :meth:`encode`'s output, produced and released
        incrementally — the TPU-native equivalent of the reference's
        streaming ``JfifWrite`` sink (writer.rs:76-106) and MCU-row-streaming
        encode loop (encoder.rs:699-807).

        Single-scan (interleaved) configurations stream MCU-row bands
        through the chunked device pipeline with O(chunk) device memory,
        host memory and retained output.  Multi-pass configurations
        (progressive, sequential, optimized tables) materialize
        coefficients by design; they yield the body as one piece.

        Typical sink wiring::

            with open(path, "wb") as f:
                for piece in enc.encode_stream(px, w, h, ColorType.RGB):
                    f.write(piece)

        Streaming INPUT: ``data`` may instead be a pull source — a callable
        ``(y0, n) -> rows`` or an object with a ``get_rows(y0, n)`` method —
        returning ``n`` interleaved pixel rows starting at row ``y0``
        (bytes or array).  This is the TPU-shaped analog of the reference's
        per-scanline ``ImageBuffer::fill_buffers`` pull model
        (image_buffer.rs:86-98): rows are requested one MCU-row band at a
        time and host input memory stays O(band), so a 16K x 16K CMYK
        encode never materializes the ~1 GB input.  Multi-pass modes
        (progressive / sequential / optimized) materialize the image by
        design; the source is then drained once into a full buffer.
        """
        import os

        color_type = ColorType(color_type)
        source = None
        if callable(data) or hasattr(data, "get_rows"):
            _check_dims(width, height)
            if width > 65535 or height > 65535:
                raise errors.DimensionsTooLarge(width, height)
            source = data.get_rows if hasattr(data, "get_rows") else data
            pixels = None
        else:
            pixels = _validate_pixels(data, width, height, color_type)
        config = self._config()
        device_on = os.environ.get("TPUENC_DEVICE_ENTROPY", "1") != "0"
        if (
            config.mode() != "interleaved"
            or config.optimize_huffman_table
            or not device_on
        ):
            if pixels is None:  # drain the source; multi-pass needs it all
                pixels = _validate_pixels(
                    self._drain_source(source, width, height, color_type),
                    width, height, color_type,
                )
            yield from self._stream_multipass(
                pixels, width, height, color_type, config
            )
            return

        from .entropy.chunked import iter_encode_interleaved_chunked
        from .entropy.device_encode import build_scan_plan
        from .kernels.pipeline import scan_layout

        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        q_tables = [
            quantization_table(config.quantization[0], config.quality, luma=True),
            quantization_table(config.quantization[1], config.quality, luma=False),
        ]
        huffman = [list(pair) for pair in default_tables()]

        prefix = self._leading_segments(config, jct)
        prefix += self._frame_header(
            width, height, components, q_tables, huffman, config,
            len(components),
        )
        layout = scan_layout(width, height, color_type, config)
        ((_, _, spectral),) = build_scan_plan(layout, components, config)
        prefix += segments.sos(list(components), spectral)
        yield bytes(prefix)

        self.last_encode_path = "device-chunked-stream"
        yield from iter_encode_interleaved_chunked(
            source if source is not None else pixels,
            width, height, color_type, config, huffman,
            chunk_mcu_rows,
        )
        yield segments.marker(markers.EOI)

    def _stream_multipass(self, pixels, width, height, color_type, config):
        """Per-scan streaming for multi-pass modes: coefficients are
        materialized by design (encoder.rs:810-864, 869-975), but the
        OUTPUT still streams — leading segments + frame header with the
        first scan, then each further scan's SOS + entropy payload as its
        own piece, then EOI — mirroring the reference writing each scan to
        the sink as it is produced instead of retaining the whole body."""
        import os

        flag = os.environ.get("TPUENC_DEVICE_ENTROPY", "1")
        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        q_tables = [
            quantization_table(config.quantization[0], config.quality, luma=True),
            quantization_table(config.quantization[1], config.quality, luma=False),
        ]
        huffman = [list(pair) for pair in default_tables()]

        scans = None
        if flag != "0":
            ncomp = len(components)
            plan_len = ncomp
            if config.progressive_scans is not None:
                plan_len = ncomp + (config.progressive_scans - 1) * ncomp
            blocks = (width // 8 + 1) * (height // 8 + 1)
            if plan_len <= 48:
                try:
                    from .entropy.device_encode import pack_version

                    if blocks <= DEVICE_BLOCK_LIMIT:
                        scans = self._device_scan_payloads(
                            pixels, width, height, color_type, config,
                            huffman,
                        )
                        if scans is not None:
                            self.last_encode_path = f"device-{pack_version()}"
                    else:
                        # Bounded-memory multi-pass path: any size the
                        # reference handles (encoder.rs:810-864, 869-975).
                        from .entropy.chunked_multipass import (
                            encode_multipass_chunked,
                        )

                        scans = encode_multipass_chunked(
                            pixels, width, height, color_type, config,
                            huffman,
                        )
                        if scans is not None:
                            self.last_encode_path = (
                                "device-chunked-multipass"
                            )
                except Exception as e:
                    if flag == "strict":
                        raise
                    FALLBACK_COUNTS["error"] += 1
                    _log.warning(
                        "device entropy path failed; falling back to host:"
                        " %r", e
                    )
                    scans = None
        if scans is None:
            # Host (or declined-device) path: one body piece, identical
            # bytes, same fallback accounting as encode().
            yield self._encode_pixels(pixels, width, height, color_type)
            return

        from .entropy.device_encode import build_scan_plan
        from .kernels.pipeline import scan_layout

        out = self._leading_segments(config, jct)
        out += self._frame_header(
            width, height, components, q_tables, huffman, config,
            len(components),
        )
        layout = scan_layout(width, height, color_type, config)
        plan = build_scan_plan(layout, components, config)
        interleaved = layout["interleaved"]
        piece = bytes(out)
        for (stream_idx, spec, spectral), payload in zip(plan, scans):
            sos_comps = (
                list(components) if interleaved else [components[stream_idx]]
            )
            yield piece + segments.sos(sos_comps, spectral) + payload
            piece = b""
        yield segments.marker(markers.EOI)

    @staticmethod
    def _drain_source(source, width, height, color_type) -> np.ndarray:
        r = source(0, height)
        if isinstance(r, (bytes, bytearray, memoryview)):
            return np.frombuffer(r, np.uint8)
        return np.asarray(r, dtype=np.uint8)

    def encode_image(self, image: ImageBuffer) -> bytes:
        """Encode a user-supplied :class:`ImageBuffer`
        (reference encoder.rs:506-515)."""
        width, height = image.width(), image.height()
        _check_dims(width, height)
        jct = image.get_jpeg_color_type()
        ct_in = getattr(image, "color_type", lambda: None)()
        if ct_in is not None:
            # Converting buffer (reference image_buffer.rs:135-204): the
            # planes are in the declared INPUT colorspace; run the normal
            # conversion pipeline.
            ct_in = ColorType(ct_in)
            if ct_in.jpeg_color_type is not jct:
                # In the reference this mismatch is unrepresentable (the
                # trait impl fixes both); here it is a usage error.
                raise ValueError(
                    f"ImageBuffer.color_type() {ct_in} encodes as "
                    f"{ct_in.jpeg_color_type}, but get_jpeg_color_type() "
                    f"returned {jct}"
                )
            planes = image.to_planes()
            stacked = np.stack(
                [np.asarray(p, dtype=np.uint8) for p in planes], axis=-1
            )
            if ct_in.bytes_per_pixel == 1:
                stacked = stacked[..., 0]
            return self._finish(
                self._encode_pixels(stacked, width, height, ct_in)
            )
        planes = image.to_planes()
        # Pack planes into an interleaved array and reuse the passthrough
        # color types (planes are already in JPEG colorspace).
        ct = {
            JpegColorType.LUMA: ColorType.LUMA,
            JpegColorType.YCBCR: ColorType.YCBCR,
            JpegColorType.CMYK: ColorType.CMYK,
            JpegColorType.YCCK: ColorType.YCCK,
        }[jct]
        stacked = np.stack(
            [np.asarray(p, dtype=np.uint8) for p in planes], axis=-1
        )
        if jct is JpegColorType.CMYK:
            # CMYK planes are already inverted; undo so the pipeline's
            # ingest inversion (image_buffer.rs:250-255) round-trips.
            stacked = 255 - stacked
        if jct is JpegColorType.LUMA:
            stacked = stacked[..., 0]
        return self._finish(self._encode_pixels(stacked, width, height, ct))

    def encode_batch(
        self,
        images,
        width: int,
        height: int,
        color_type: ColorType,
    ) -> List[bytes]:
        """Encode a batch of same-shape images with pipelined device
        dispatch (H2D/compute/D2H overlap across images).

        ``images``: iterable of pixel buffers (bytes or arrays), each laid
        out as for :meth:`encode`.  This is the high-throughput serving
        path; a TPU-native extension over the reference's one-image API.
        """
        import os

        color_type = ColorType(color_type)
        bpp = color_type.bytes_per_pixel
        required = width * height * bpp
        pixel_arrays = []
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
            pixel_arrays.append(px)
        _check_dims(width, height)

        config = self._config()
        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)
        q_tables = [
            quantization_table(config.quantization[0], config.quality, luma=True),
            quantization_table(config.quantization[1], config.quality, luma=False),
        ]
        huffman = [list(pair) for pair in default_tables()]

        prefix = bytearray()
        prefix += segments.marker(markers.SOI)
        prefix += segments.app0_jfif(config.density)
        if jct is JpegColorType.CMYK:
            prefix += segments.app14_adobe(0)
        elif jct is JpegColorType.YCCK:
            prefix += segments.app14_adobe(2)
        for nr, data in self._app_segments:
            prefix += segments.segment(markers.APP(nr), data)

        batch_scans = None
        if os.environ.get("TPUENC_DEVICE_ENTROPY", "1") != "0":
            try:
                from .entropy import device_encode as de

                batch_scans = de.device_encode_batch_fused(
                    np.stack(pixel_arrays), width, height, color_type,
                    config, huffman,
                )
                if batch_scans is None:
                    batch_scans = de.device_encode_batch(
                        pixel_arrays, width, height, color_type, config,
                        huffman,
                    )
            except Exception as e:
                if os.environ.get("TPUENC_DEVICE_ENTROPY") == "strict":
                    raise
                FALLBACK_COUNTS["error"] += 1
                _log.warning(
                    "device batch path failed; falling back: %r", e
                )
                batch_scans = None

        results = []
        if batch_scans is not None:
            self.last_encode_path = "device-batch"
            for scans in batch_scans:
                body = self._assemble_scans(
                    scans, width, height, color_type, config, components,
                    q_tables, huffman,
                )
                # _finish per image: a configured sink (new_file/new_writer)
                # sees every result, matching encode()'s semantics (and the
                # host fallback below, which goes through encode()).
                results.append(
                    self._finish(
                        bytes(prefix) + body + segments.marker(markers.EOI)
                    )
                )
            return results

        return [
            self.encode(px, width, height, color_type) for px in pixel_arrays
        ]

    def _finish(self, payload: bytes) -> bytes:
        try:
            if self._path is not None:
                with open(self._path, "wb") as f:
                    f.write(payload)
            if self._writer is not None:
                self._writer.write(payload)
        except OSError as e:
            raise errors.WriteError(str(e)) from e
        return payload

    def _leading_segments(self, config, jct) -> bytearray:
        """SOI + JFIF APP0 + (Adobe APP14) + user APP segments — everything
        before the frame header (reference encoder.rs:536-554)."""
        out = bytearray()
        out += segments.marker(markers.SOI)
        out += segments.app0_jfif(config.density)
        if jct is JpegColorType.CMYK:
            out += segments.app14_adobe(0)
        elif jct is JpegColorType.YCCK:
            out += segments.app14_adobe(2)
        for nr, data in self._app_segments:
            out += segments.segment(markers.APP(nr), data)
        return out

    def _encode_pixels(
        self, pixels: np.ndarray, width: int, height: int, color_type: ColorType
    ) -> bytes:
        config = self._config()
        jct = color_type.jpeg_color_type
        components = init_components(jct, config.sampling_factor)

        q_tables = [
            quantization_table(config.quantization[0], config.quality, luma=True),
            quantization_table(config.quantization[1], config.quality, luma=False),
        ]
        huffman = [list(pair) for pair in default_tables()]

        out = self._leading_segments(config, jct)

        body = self._encode_body_device(
            pixels, width, height, color_type, config, components,
            q_tables, huffman,
        )
        if body is None:
            FALLBACK_COUNTS["host"] += 1
            self.last_encode_path = "host"
            body = self._encode_body_host(
                pixels, width, height, color_type, config, components,
                q_tables, huffman,
            )
        out += body

        out += segments.marker(markers.EOI)
        return bytes(out)

    def _encode_body_device(
        self, pixels, width, height, color_type, config, components,
        q_tables, huffman,
    ) -> Optional[bytes]:
        """Fully-on-device scan encoding (entropy.device_encode); returns
        None to fall back to the host path."""
        import os

        flag = os.environ.get("TPUENC_DEVICE_ENTROPY", "1")
        if flag == "0":
            return None
        strict = flag == "strict"
        try:
            from .entropy import device_encode as de

            # The fused whole-image program materializes one packed-word
            # row per (scan, block) pair; its memory scales with the
            # plan's TOTAL pack rows, not the plan length.  A 64-scan
            # progressive plan over a small image is fine (the reference
            # domain is 2-64 scans per component, encoder.rs:321-333);
            # a big image with many scans must stream through the
            # bounded-memory multipass path instead.
            plan_rows = _plan_pack_rows(width, height, color_type, config)
            # Very large block counts would blow the whole-image packing
            # tree's intermediate memory (~1KB/block): stream MCU-row
            # chunks through the device packer instead (bounded memory,
            # reference streaming model encoder.rs:699-807).
            if (
                (width // 8 + 1) * (height // 8 + 1) > DEVICE_BLOCK_LIMIT
                or plan_rows > DEVICE_PACK_ROWS_LIMIT
            ):
                if (
                    config.mode() == "interleaved"
                    and not config.optimize_huffman_table
                ):
                    from .entropy.chunked import encode_interleaved_chunked

                    scan = encode_interleaved_chunked(
                        pixels, width, height, color_type, config, huffman
                    )
                    if scan is None:
                        _log.info("chunked device path overflowed budgets")
                        return None
                    self.last_encode_path = "device-chunked"
                    return self._assemble_scans(
                        [scan], width, height, color_type, config,
                        components, q_tables, huffman,
                    )
                # Multi-pass modes (sequential / progressive / optimized):
                # coefficients stream into an HBM store, then every scan
                # packs in bounded chunks — any image size the reference
                # handles (encoder.rs:810-864, 869-975) stays on device.
                from .entropy.chunked_multipass import (
                    encode_multipass_chunked,
                )

                payloads = encode_multipass_chunked(
                    pixels, width, height, color_type, config, huffman
                )
                if payloads is None:
                    _log.info("chunked multipass path overflowed budgets")
                    return None
                self.last_encode_path = "device-chunked-multipass"
                return self._assemble_scans(
                    payloads, width, height, color_type, config,
                    components, q_tables, huffman,
                )

            scans = self._device_scan_payloads(
                pixels, width, height, color_type, config, huffman
            )
            if scans is None:
                _log.info("device entropy declined: budget overflow")
                return None
            self.last_encode_path = f"device-{de.pack_version()}"
            return self._assemble_scans(
                scans, width, height, color_type, config, components,
                q_tables, huffman,
            )
        except Exception as e:
            if strict:
                raise
            FALLBACK_COUNTS["error"] += 1
            _log.warning(
                "device entropy path failed; falling back to host: %r", e
            )
            return None

    @staticmethod
    def _device_scan_payloads(
        pixels, width, height, color_type, config, huffman,
    ) -> Optional[list]:
        """Per-scan device entropy payloads (stuffed, RST-inserted), or
        None on budget overflow.  Mutates ``huffman`` in place with the
        optimized tables when the config asks for them (the caller's
        frame header must emit the tables the scans were packed with)."""
        from .entropy import device_encode as de

        if config.optimize_huffman_table:
            fn, comps, cm = de._build_coeff_hist_fn(
                width, height, color_type, config
            )
            streams, hists = fn(pixels)
            from .core.tables import optimized_huffman_table

            hists_np = []
            for i, (dc_h, ac_h) in enumerate(hists):
                dc_freq = np.zeros(257, np.int64)
                dc_freq[:256] = np.asarray(dc_h)[:256]
                dc_freq[256] = 1
                ac_freq = np.zeros(257, np.int64)
                ac_freq[:256] = np.asarray(ac_h)[:256]
                ac_freq[256] = 1
                hists_np.append((dc_freq, ac_freq))
                huffman[i] = [
                    optimized_huffman_table(dc_freq),
                    optimized_huffman_table(ac_freq),
                ]
            # Size the aggregate pack budget exactly from the first-pass
            # statistics (VERDICT r4 #4): symbol counts x optimized code
            # sizes give total stream bits, so the ladder can start at
            # the covering rung instead of probing up from the bottom.
            from .entropy.huffopt import (
                budget_hint_from_bits,
                exact_stream_bits,
            )

            hint = budget_hint_from_bits(
                exact_stream_bits(hists_np, huffman[: len(hists_np)]),
                _plan_pack_rows(width, height, color_type, config),
            )
            return de.device_encode_scans(
                pixels, width, height, color_type, config, huffman,
                comp_streams=streams, comp_streams_cm=cm,
                budget_hint=hint,
            )
        return de.device_encode_scans(
            pixels, width, height, color_type, config, huffman
        )

    def _assemble_scans(
        self, scan_payloads, width, height, color_type, config, components,
        q_tables, huffman,
    ) -> bytes:
        """Frame header + per-scan SOS + entropy payloads, following the
        scan plan shared with the device path."""
        from .entropy.device_encode import build_scan_plan
        from .kernels.pipeline import scan_layout

        layout = scan_layout(width, height, color_type, config)
        plan = build_scan_plan(layout, components, config)
        out = bytearray()
        out += self._frame_header(
            width, height, components, q_tables, huffman, config,
            len(components),
        )
        interleaved = layout["interleaved"]
        for (stream_idx, spec, spectral), payload in zip(plan, scan_payloads):
            sos_comps = (
                list(components) if interleaved else [components[stream_idx]]
            )
            out += segments.sos(sos_comps, spectral)
            out += payload
        return bytes(out)

    def _encode_body_host(
        self, pixels, width, height, color_type, config, components,
        q_tables, huffman,
    ) -> bytes:
        fn, layout = coefficients_fn(width, height, color_type, config)
        comp_blocks = [np.asarray(b) for b in fn(pixels)]

        mode = config.mode()
        if mode == "interleaved":
            return self._encode_interleaved(
                comp_blocks[0], layout, components, q_tables, huffman,
                width, height, config,
            )
        if config.optimize_huffman_table:
            optimized = optimize_tables(
                comp_blocks, components, config.progressive_scans
            )
            for i, pair in enumerate(optimized):
                huffman[i] = list(pair)
        if mode == "sequential":
            return self._encode_sequential(
                comp_blocks, components, q_tables, huffman,
                width, height, config,
            )
        return self._encode_progressive(
            comp_blocks, components, q_tables, huffman,
            width, height, config,
        )

    def _frame_header(
        self,
        width: int,
        height: int,
        components: Sequence[Component],
        q_tables: Sequence[QuantizationTable],
        huffman,
        config: EncoderConfig,
        num_components: int,
    ) -> bytes:
        """SOF + DQTs + DHTs + optional DRI (reference encoder.rs:633-667)."""
        out = bytearray()
        out += segments.sof(
            width, height, components, config.progressive_scans is not None
        )
        out += segments.dqt(0, q_tables[0])
        out += segments.dqt(1, q_tables[1])
        out += segments.dht(0, 0, huffman[0][0])
        out += segments.dht(1, 0, huffman[0][1])
        if num_components >= 3:
            out += segments.dht(0, 1, huffman[1][0])
            out += segments.dht(1, 1, huffman[1][1])
        if config.restart_interval is not None:
            out += segments.dri(config.restart_interval)
        return bytes(out)

    def _encode_interleaved(
        self, blocks, layout, components, q_tables, huffman, width, height, config
    ) -> bytes:
        out = bytearray()
        out += self._frame_header(
            width, height, components, q_tables, huffman, config, len(components)
        )
        out += segments.sos(components)

        bpm = len(layout["mcu_block_comps"])
        comp_ids = np.tile(
            np.asarray(layout["mcu_block_comps"], dtype=np.int32),
            layout["mcu_count"],
        )
        interval = (config.restart_interval or 0) * bpm
        dc_tabs = [huffman[c.dc_huffman_table][0] for c in components]
        ac_tabs = [huffman[c.ac_huffman_table][1] for c in components]
        out += _pack_scan(
            blocks, comp_ids, dc_tabs, ac_tabs,
            restart_interval_blocks=interval,
        )
        return bytes(out)

    def _encode_sequential(
        self, comp_blocks, components, q_tables, huffman, width, height, config
    ) -> bytes:
        """One scan per component (reference encoder.rs:810-864)."""
        out = bytearray()
        out += self._frame_header(
            width, height, components, q_tables, huffman, config, len(components)
        )
        interval = config.restart_interval or 0
        for comp, blocks in zip(components, comp_blocks):
            out += segments.sos([comp])
            out += _pack_scan(
                blocks, None,
                [huffman[comp.dc_huffman_table][0]],
                [huffman[comp.ac_huffman_table][1]],
                restart_interval_blocks=interval,
            )
        return bytes(out)

    def _encode_progressive(
        self, comp_blocks, components, q_tables, huffman, width, height, config
    ) -> bytes:
        """Spectral-selection progressive (reference encoder.rs:869-975):
        per-component DC scans, then AC band scans with the component loop
        inside the band loop."""
        out = bytearray()
        out += self._frame_header(
            width, height, components, q_tables, huffman, config, len(components)
        )
        interval = config.restart_interval or 0

        for comp, blocks in zip(components, comp_blocks):
            out += segments.sos([comp], spectral=(0, 0))
            out += _pack_scan(
                blocks, None,
                [huffman[comp.dc_huffman_table][0]], [None],
                restart_interval_blocks=interval,
                emit_ac=False,
            )

        for start, end in progressive_bands(config.progressive_scans):
            for comp, blocks in zip(components, comp_blocks):
                out += segments.sos([comp], spectral=(start, end - 1))
                out += _pack_scan(
                    blocks, None,
                    [None], [huffman[comp.ac_huffman_table][1]],
                    restart_interval_blocks=interval,
                    emit_dc=False,
                    spectral_start=start,
                    spectral_end=end,
                )
        return bytes(out)


def _pack_scan(blocks, comp_ids, dc_tabs, ac_tabs, **kw) -> bytes:
    """Dispatch one scan to the native packer, falling back to the oracle."""
    packed = native_entropy.encode_scan(blocks, comp_ids, dc_tabs, ac_tabs, **kw)
    if packed is not None:
        return packed
    return encode_scan(blocks, comp_ids, dc_tabs, ac_tabs, **kw)


def _freeze_qspec(spec):
    if isinstance(spec, str):
        return spec
    return tuple(int(v) for v in spec)
