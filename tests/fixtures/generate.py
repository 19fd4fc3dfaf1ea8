"""Generate the frozen golden JPEG fixtures.

Run manually (``python tests/fixtures/generate.py``) only when an
*intentional* bitstream change is made; the paired test asserts current
encoder output is byte-identical to these files, so any semantic drift in
tables, scan structure or entropy coding fails loudly (the role of the
raw-byte expectations in the reference suite, ``lib.rs:417-428, 467-505``).

Every fixture is validated before freezing: decoded with the independent
in-repo decoder (coefficient round-trip) and by Pillow when available.
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tpuenc import ColorType, Encoder, SamplingFactor  # noqa: E402
from tpuenc.testing import decode_coefficients  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
W, H = 26, 19  # partial trailing MCU both ways at 2x2 sampling


def _img(ch, seed):
    rng = np.random.default_rng(seed)
    shape = (H, W) if ch == 1 else (H, W, ch)
    return rng.integers(0, 256, shape, np.uint8)


def build_cases():
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

    return {
        "baseline_q90_444": (baseline, ColorType.RGB, 3, 0),
        "restart2_q80_420": (restart_420, ColorType.RGB, 3, 1),
        "progressive4_q90": (progressive, ColorType.RGB, 3, 2),
        "optimized_q95": (optimized, ColorType.RGB, 3, 3),
        "factor4_seq_q85": (factor4, ColorType.RGB, 3, 4),
        "opt_prog3_rst3_q90": (opt_prog, ColorType.RGB, 3, 5),
        "luma_q85": (lambda: Encoder(85), ColorType.LUMA, 1, 6),
        "cmyk_q85": (lambda: Encoder(85), ColorType.CMYK, 4, 7),
        "ycck_q85_420": (
            lambda: (lambda e: (e.set_sampling_factor(SamplingFactor.F_2_2), e)[1])(
                Encoder(85)
            ),
            ColorType.CMYK_AS_YCCK,
            4,
            8,
        ),
    }


def main():
    os.environ["TPUENC_DEVICE_ENTROPY"] = "0"  # host oracle path
    for name, (build, ct, ch, seed) in build_cases().items():
        img = _img(ch, seed)
        out = build().encode(img.tobytes(), W, H, ct)
        dec = decode_coefficients(out)
        assert (dec.width, dec.height) == (W, H), name
        try:
            from PIL import Image

            im = Image.open(io.BytesIO(out))
            im.load()
            assert im.size == (W, H), name
        except ImportError:
            pass
        path = os.path.join(HERE, f"{name}.jpg")
        with open(path, "wb") as f:
            f.write(out)
        print(f"{name:24s} {len(out):6d} B -> {path}")


if __name__ == "__main__":
    main()
