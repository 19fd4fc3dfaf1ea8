"""Property-based fuzzing (the reference's cargo-fuzz analog, SURVEY §4.5).

The reference drives arbitrary bytes as square images through each encode
mode with the single invariant "never panics"
(fuzz/fuzz_targets/encode_rgb.rs etc.).  Here: random shapes, qualities and
configs through the full encoder; invariants are (a) no exception, (b) a
well-formed JFIF container, (c) the independent decoder accepts the output.
Uses hypothesis when available, otherwise a seeded sweep.
"""

import io
import os

import numpy as np
import pytest

pytest.importorskip("jax")

from tpuenc import ColorType, Encoder, SamplingFactor

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:
    HAVE_HYPOTHESIS = False


FACTORS = list(SamplingFactor)[:8]
CTYPES = [
    ColorType.LUMA,
    ColorType.RGB,
    ColorType.RGBA,
    ColorType.BGR,
    ColorType.BGRA,
    ColorType.YCBCR,
    ColorType.CMYK,
    ColorType.CMYK_AS_YCCK,
    ColorType.YCCK,
]


def _run_case(w, h, quality, ct, factor, progressive, optimized, restart, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(
        0, 256, size=w * h * ct.bytes_per_pixel, dtype=np.uint8
    ).tobytes()
    enc = Encoder(quality)
    enc.set_sampling_factor(factor)
    if progressive:
        enc.set_progressive(True)
    if optimized:
        enc.set_optimized_huffman_tables(True)
    if restart:
        enc.set_restart_interval(restart)
    out = enc.encode(data, w, h, ct)
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"

    from PIL import Image

    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (w, h)


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=int(os.environ.get("TPUENC_FUZZ_EXAMPLES", "15")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        quality=st.integers(1, 100),
        ct=st.sampled_from(CTYPES),
        factor=st.sampled_from(FACTORS),
        progressive=st.booleans(),
        optimized=st.booleans(),
        restart=st.sampled_from([0, 1, 3, 17]),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_encode(
        w, h, quality, ct, factor, progressive, optimized, restart, seed
    ):
        _run_case(
            w, h, quality, ct, factor, progressive, optimized, restart, seed
        )

else:

    def test_fuzz_encode_sweep():
        rng = np.random.default_rng(0)
        for i in range(15):
            _run_case(
                int(rng.integers(1, 40)),
                int(rng.integers(1, 40)),
                int(rng.integers(1, 101)),
                CTYPES[i % len(CTYPES)],
                FACTORS[i % len(FACTORS)],
                bool(i % 2),
                bool(i % 3 == 0),
                [0, 1, 3, 17][i % 4],
                i,
            )
