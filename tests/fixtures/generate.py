"""Generate the frozen golden JPEG fixtures.

Run manually (``python tests/fixtures/generate.py``) only when an
*intentional* bitstream change is made; the paired test asserts current
encoder output is byte-identical to these files, so any semantic drift in
tables, scan structure or entropy coding fails loudly (the role of the
raw-byte expectations in the reference suite, ``lib.rs:417-428, 467-505``).

Every fixture is validated before freezing: decoded with the independent
in-repo decoder (coefficient round-trip) and by Pillow when available.

The corpus covers every sampling factor, custom + preset quantization
tables, progressive/sequential/optimized modes, restarts, all four JPEG
colorspaces, metadata embedding (ICC across APP2 chunks, EXIF, raw APP
segments, density), quality extremes, and the reference's 258-px
partial-MCU stress geometry (``lib.rs:82``).
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tpuenc import ColorType, Encoder, PixelDensity, SamplingFactor  # noqa: E402
from tpuenc.testing import decode_coefficients  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
W, H = 26, 19  # partial trailing MCU both ways at 2x2 sampling
GEOM_W, GEOM_H = 258, 172  # reference partial-MCU stress width (lib.rs:82)


def _img(ch, seed, w=W, h=H):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, shape, np.uint8)


def _icc_bytes():
    # Deterministic pseudo-profile long enough to require two APP2 chunks
    # (chunk limit 65519 bytes, encoder.rs:392-417).
    return bytes(np.random.default_rng(1234).integers(0, 256, 70000, np.uint8))


def build_cases():
    """name -> (encoder builder, color type, channels, seed, width, height)."""

    def baseline():
        return Encoder(90)

    def restart_420():
        e = Encoder(80)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        e.set_restart_interval(2)
        return e

    def progressive():
        e = Encoder(90)
        e.set_progressive_scans(4)
        return e

    def optimized():
        e = Encoder(95)
        e.set_optimized_huffman_tables(True)
        return e

    def factor4():
        e = Encoder(85)
        e.set_sampling_factor(SamplingFactor.F_4_1)
        return e

    def opt_prog():
        e = Encoder(90)
        e.set_progressive_scans(3)
        e.set_optimized_huffman_tables(True)
        e.set_restart_interval(3)
        return e

    def sampled(factor, q=80):
        def b():
            e = Encoder(q)
            e.set_sampling_factor(factor)
            return e

        return b

    def custom_q():
        e = Encoder(50)  # quality must be ignored for custom tables
        e.set_quantization_tables([1] * 64, [1] * 64)
        return e

    def preset_q():
        e = Encoder(80)
        e.set_quantization_tables("custom_ms_ssim", "custom_ms_ssim")
        return e

    def ycck_prog_rst():
        e = Encoder(90)
        e.set_progressive_scans(4)
        e.set_restart_interval(2)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        return e

    def icc():
        e = Encoder(90)
        e.add_icc_profile(_icc_bytes())
        return e

    def metadata():
        e = Encoder(88)
        e.add_exif_metadata(b"II*\x00\x08\x00\x00\x00tpuenc-exif")
        e.add_app_segment(5, b"tpuenc-fixture-app5")
        e.set_density(PixelDensity.dpi(300))
        return e

    def geom_rst():
        e = Encoder(80)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        e.set_restart_interval(4)
        return e

    def q100_flat():
        e = Encoder(100)
        e.set_quantization_tables("flat", "flat")
        return e

    def luma_prog():
        e = Encoder(85)
        e.set_progressive_scans(3)
        return e

    return {
        # --- original corpus (bytes frozen in round 2; do not disturb) ---
        "baseline_q90_444": (baseline, ColorType.RGB, 3, 0, W, H),
        "restart2_q80_420": (restart_420, ColorType.RGB, 3, 1, W, H),
        "progressive4_q90": (progressive, ColorType.RGB, 3, 2, W, H),
        "optimized_q95": (optimized, ColorType.RGB, 3, 3, W, H),
        "factor4_seq_q85": (factor4, ColorType.RGB, 3, 4, W, H),
        "opt_prog3_rst3_q90": (opt_prog, ColorType.RGB, 3, 5, W, H),
        "luma_q85": (lambda: Encoder(85), ColorType.LUMA, 1, 6, W, H),
        "cmyk_q85": (lambda: Encoder(85), ColorType.CMYK, 4, 7, W, H),
        "ycck_q85_420": (
            lambda: (lambda e: (e.set_sampling_factor(SamplingFactor.F_2_2), e)[1])(
                Encoder(85)
            ),
            ColorType.CMYK_AS_YCCK,
            4,
            8,
            W, H),
        # --- round-3 corpus growth (VERDICT #5) ---
        "f21_q80": (sampled(SamplingFactor.F_2_1), ColorType.RGB, 3, 9, W, H),
        "f12_q80": (sampled(SamplingFactor.F_1_2), ColorType.RGB, 3, 10, W, H),
        "f14_seq_q85": (sampled(SamplingFactor.F_1_4, 85), ColorType.RGB, 3, 11, W, H),
        "f42_seq_q75": (sampled(SamplingFactor.F_4_2, 75), ColorType.RGB, 3, 12, W, H),
        "f24_seq_q75": (sampled(SamplingFactor.F_2_4, 75), ColorType.RGB, 3, 13, W, H),
        "customq_allones": (custom_q, ColorType.RGB, 3, 14, W, H),
        "preset_msssim_q80": (preset_q, ColorType.RGB, 3, 15, W, H),
        "ycck_prog4_rst2_q90": (
            ycck_prog_rst, ColorType.CMYK_AS_YCCK, 4, 16, W, H),
        "icc_2chunk_q90": (icc, ColorType.RGB, 3, 17, W, H),
        "exif_app5_dpi300_q88": (metadata, ColorType.RGB, 3, 18, W, H),
        "geom258x172_q90_444": (baseline, ColorType.RGB, 3, 19, GEOM_W, GEOM_H),
        "geom258x172_rst4_q80_420": (
            geom_rst, ColorType.RGB, 3, 20, GEOM_W, GEOM_H),
        "q1_extreme": (lambda: Encoder(1), ColorType.RGB, 3, 21, W, H),
        "q100_flat": (q100_flat, ColorType.RGB, 3, 22, W, H),
        "ycbcr_passthrough_q88": (
            lambda: Encoder(88), ColorType.YCBCR, 3, 23, W, H),
        "bgra_q90": (lambda: Encoder(90), ColorType.BGRA, 4, 24, W, H),
        "luma_prog3_q85": (luma_prog, ColorType.LUMA, 1, 25, W, H),
    }


_COLOR_TO_RUST = {
    "luma": "Luma", "rgb": "Rgb", "rgba": "Rgba", "bgr": "Bgr",
    "bgra": "Bgra", "ycbcr": "Ycbcr", "cmyk": "Cmyk",
    "cmyk_as_ycck": "CmykAsYcck", "ycck": "Ycck",
}


def export_inputs(out_dir: str) -> None:
    """Export each fixture's raw input + encoder settings so a Rust
    environment can regenerate TRUE reference bytes and diff them against
    the frozen fixtures (see ``tools/capture_reference.sh``).

    Manifest line:
      name w h color quality h_samp v_samp prog rst opt qluma qchroma
      dens_x dens_y dens_unit
    ``prog``/``rst`` are -1 for unset; q specs are a preset name or
    ``custom:v0,..,v63``.  App segments (ICC/EXIF included — they are
    expanded into APP segments at set time) go to ``<name>.apps`` as
    repeated ``[u8 nr][u32be len][bytes]`` records.
    """
    os.makedirs(out_dir, exist_ok=True)
    lines = []
    for name, (build, ct, ch, seed, w, h) in build_cases().items():
        enc = build()
        img = _img(ch, seed, w, h)
        with open(os.path.join(out_dir, f"{name}.raw"), "wb") as f:
            f.write(img.tobytes())
        hs, vs = enc.sampling_factor().get_sampling_factors()

        def qspec(q):
            return (
                "custom:" + ",".join(str(v) for v in q)
                if isinstance(q, tuple) else str(q)
            )

        ql, qc = enc.quantization_tables()
        d = enc.density()
        lines.append(
            f"{name} {w} {h} {_COLOR_TO_RUST[ct.value]} {enc.quality} "
            f"{hs} {vs} {enc.progressive_scans() or -1} "
            f"{enc.restart_interval() or -1} "
            f"{int(enc.optimized_huffman_tables())} "
            f"{qspec(ql)} {qspec(qc)} "
            f"{d.density[0]} {d.density[1]} {d.unit.value}"
        )
        if enc._app_segments:
            with open(os.path.join(out_dir, f"{name}.apps"), "wb") as f:
                for nr, data in enc._app_segments:
                    f.write(bytes([nr]))
                    f.write(len(data).to_bytes(4, "big"))
                    f.write(data)
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"exported {len(lines)} fixture inputs to {out_dir}")


def main():
    os.environ["TPUENC_DEVICE_ENTROPY"] = "0"  # host oracle path
    if len(sys.argv) >= 3 and sys.argv[1] == "--export":
        export_inputs(sys.argv[2])
        return
    only = set(sys.argv[1:])
    for name, (build, ct, ch, seed, w, h) in build_cases().items():
        if only and name not in only:
            continue
        img = _img(ch, seed, w, h)
        out = build().encode(img.tobytes(), w, h, ct)
        dec = decode_coefficients(out)
        assert (dec.width, dec.height) == (w, h), name
        try:
            from PIL import Image

            im = Image.open(io.BytesIO(out))
            im.load()
            assert im.size == (w, h), name
        except ImportError:
            pass
        path = os.path.join(HERE, f"{name}.jpg")
        with open(path, "wb") as f:
            f.write(out)
        print(f"{name:28s} {len(out):6d} B -> {path}")


if __name__ == "__main__":
    main()
