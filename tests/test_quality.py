"""Output-quality invariants (BASELINE.md targets).

The optimized-table path replicates the reference's K.2 pipeline exactly,
so "PSNR >= reference at equal size" holds by construction; these tests pin
the observable consequences: optimized tables never enlarge the entropy
payload, quality ordering is monotone in file size, and decoded PSNR is
sane at standard qualities."""

import io

import numpy as np
import pytest

pytest.importorskip("jax")
Image = pytest.importorskip("PIL.Image")

from tpuenc import ColorType, Encoder, SamplingFactor


def _img(w=160, h=120, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (w + h)], axis=2
    ).astype(int)
    return np.clip(base + rng.integers(-25, 25, base.shape), 0, 255).astype(
        np.uint8
    )


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


def test_optimized_tables_never_larger():
    img = _img()
    for quality in (50, 80, 95):
        base = Encoder(quality)
        base.set_sampling_factor(SamplingFactor.F_4_1)  # sequential mode
        plain = base.encode(img, 160, 120, ColorType.RGB)

        opt = Encoder(quality)
        opt.set_sampling_factor(SamplingFactor.F_4_1)
        opt.set_optimized_huffman_tables(True)
        optimized = opt.encode(img, 160, 120, ColorType.RGB)
        assert len(optimized) <= len(plain), quality


def test_quality_monotone_size():
    img = _img()
    sizes = [
        len(Encoder(q).encode(img, 160, 120, ColorType.RGB))
        for q in (20, 50, 80, 95)
    ]
    assert sizes == sorted(sizes)


def test_psnr_reasonable():
    # Smooth gradient content (noise with 4:2:0 chroma subsampling would
    # dominate the error and test the content, not the encoder).
    w, h = 160, 120
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (w + h)], axis=2
    ).astype(np.uint8)
    for quality, min_psnr in ((50, 32.0), (80, 36.0), (95, 40.0)):
        out = Encoder(quality).encode(img, 160, 120, ColorType.RGB)
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        psnr = _psnr(dec, img)
        assert psnr >= min_psnr, (quality, psnr)


def test_optimized_equal_decode():
    # Optimized tables change only entropy coding, never coefficients:
    # decoded pixels must be identical to default-table output.
    img = _img(seed=4)
    a = Encoder(85)
    a.set_sampling_factor(SamplingFactor.F_4_1)
    plain = a.encode(img, 160, 120, ColorType.RGB)
    b = Encoder(85)
    b.set_sampling_factor(SamplingFactor.F_4_1)
    b.set_optimized_huffman_tables(True)
    optimized = b.encode(img, 160, 120, ColorType.RGB)
    da = np.asarray(Image.open(io.BytesIO(plain)).convert("RGB"))
    db = np.asarray(Image.open(io.BytesIO(optimized)).convert("RGB"))
    np.testing.assert_array_equal(da, db)
