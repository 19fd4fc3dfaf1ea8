"""Round-trip integration tests.

Mirror of the reference's integration suite (lib.rs:71-554): encode
synthetic gradients (width 258 forces a partial trailing MCU, lib.rs:82),
decode with an independent decoder (Pillow/libjpeg, standing in for the
``jpeg-decoder`` dev-dependency) and assert dimensions plus per-sample
tolerance |diff| < 20 (check_result, lib.rs:162-186).  Raw-byte assertions
(DRI segment, APP segment, ICC profile) match lib.rs:417-428, 467-505,
507-539."""

import io

import numpy as np
import pytest

pytest.importorskip("jax")
Image = pytest.importorskip("PIL.Image")

from tpuenc import ColorType, Encoder, SamplingFactor, cmyk_to_ycck

W, H = 258, 172  # partial trailing MCU in both dimensions


def gradient_rgb(w=W, h=H):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (w + h)], axis=2
    ).astype(np.uint8)


def gradient_gray(w=W, h=H):
    return gradient_rgb(w, h)[..., 0].copy()


def gradient_cmyk(w=W, h=H):
    rgb = gradient_rgb(w, h)
    k = np.full((h, w, 1), 60, dtype=np.uint8)
    return np.concatenate([rgb, k], axis=2)


def decode(data: bytes):
    im = Image.open(io.BytesIO(data))
    im.load()
    return im


def check(data: bytes, reference: np.ndarray, mode: str, tolerance: int = 20):
    im = decode(data)
    assert im.size == (reference.shape[1], reference.shape[0])
    dec = np.asarray(im.convert(mode) if im.mode != mode else im).astype(np.int32)
    ref = reference.astype(np.int32)
    if dec.ndim == 2:
        dec = dec[..., None]
    if ref.ndim == 2:
        ref = ref[..., None]
    diff = np.abs(dec - ref).max()
    assert diff < tolerance, f"max diff {diff} >= {tolerance}"
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"


def encode_rgb(quality=80, setup=None, img=None):
    img = gradient_rgb() if img is None else img
    enc = Encoder(quality)
    if setup:
        setup(enc)
    return enc.encode(img.tobytes(), img.shape[1], img.shape[0], ColorType.RGB), img


@pytest.mark.parametrize("quality", [80, 100])
def test_gray(quality):
    img = gradient_gray()
    enc = Encoder(quality)
    out = enc.encode(img.tobytes(), W, H, ColorType.LUMA)
    check(out, img, "L")


@pytest.mark.parametrize("quality", [80, 100])
def test_rgb(quality):
    out, img = encode_rgb(quality)
    check(out, img, "RGB")


@pytest.mark.parametrize("quality", [80, 100])
def test_rgba(quality):
    img = gradient_rgb()
    rgba = np.concatenate(
        [img, np.full((H, W, 1), 123, dtype=np.uint8)], axis=2
    )
    enc = Encoder(quality)
    out = enc.encode(rgba.tobytes(), W, H, ColorType.RGBA)
    check(out, img, "RGB")


def test_bgr_bgra():
    img = gradient_rgb()
    enc = Encoder(90)
    out = enc.encode(img[..., ::-1].copy().tobytes(), W, H, ColorType.BGR)
    check(out, img, "RGB")
    bgra = np.concatenate(
        [img[..., ::-1], np.zeros((H, W, 1), dtype=np.uint8)], axis=2
    )
    out = Encoder(90).encode(bgra.tobytes(), W, H, ColorType.BGRA)
    check(out, img, "RGB")


def test_custom_quantization_all_ones():
    # lib.rs custom q-table test: all-1 table ~ near-lossless.
    out, img = encode_rgb(
        100,
        lambda e: e.set_quantization_tables([1] * 64, [1] * 64),
    )
    check(out, img, "RGB", tolerance=10)


@pytest.mark.parametrize(
    "factor",
    [
        SamplingFactor.F_1_1,
        SamplingFactor.F_2_1,
        SamplingFactor.F_1_2,
        SamplingFactor.F_2_2,
        SamplingFactor.F_4_1,
        SamplingFactor.F_1_4,
        SamplingFactor.F_4_2,
        SamplingFactor.F_2_4,
    ],
)
def test_sampling_factors(factor):
    out, img = encode_rgb(80, lambda e: e.set_sampling_factor(factor))
    check(out, img, "RGB")


def test_progressive():
    out, img = encode_rgb(80, lambda e: e.set_progressive(True))
    check(out, img, "RGB")
    assert b"\xff\xc2" in out  # SOF2


@pytest.mark.parametrize("scans", [2, 3, 7, 33])
def test_progressive_scan_counts(scans):
    out, img = encode_rgb(80, lambda e: e.set_progressive_scans(scans))
    check(out, img, "RGB")


def test_progressive_64_scans_structural():
    # scans=64 reproduces the reference's band math verbatim
    # (encoder.rs:929-936), whose first AC band is empty (Ss=1, Se=0) —
    # libjpeg rejects such scans, so assert structure only.
    out, _ = encode_rgb(80, lambda e: e.set_progressive_scans(64))
    assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in out
    assert out.count(b"\xff\xda") == 3 + 63 * 3  # 3 DC + 63 bands x 3 comps


def test_optimized():
    out, img = encode_rgb(100, lambda e: e.set_optimized_huffman_tables(True))
    check(out, img, "RGB")
    # Optimized tables must not produce a larger file than the K.3
    # defaults on the same image/config.
    base, _ = encode_rgb(100, lambda e: None)
    assert len(out) <= len(base)


def test_optimized_progressive():
    out, img = encode_rgb(
        100,
        lambda e: (
            e.set_optimized_huffman_tables(True),
            e.set_progressive(True),
        ),
    )
    check(out, img, "RGB")


def test_restart_interval():
    out, img = encode_rgb(80, lambda e: e.set_restart_interval(32))
    check(out, img, "RGB")
    # Raw DRI segment bytes (lib.rs:417-428): FFDD 0004 0020.
    assert b"\xff\xdd\x00\x04\x00\x20" in out
    assert b"\xff\xd0" in out


def test_restart_interval_4_1():
    out, img = encode_rgb(
        80,
        lambda e: (
            e.set_restart_interval(32),
            e.set_sampling_factor(SamplingFactor.F_4_1),
        ),
    )
    check(out, img, "RGB")


def test_restart_interval_progressive():
    out, img = encode_rgb(
        80,
        lambda e: (e.set_restart_interval(32), e.set_progressive(True)),
    )
    check(out, img, "RGB")


def test_cmyk():
    img = gradient_cmyk()
    out = Encoder(100).encode(img.tobytes(), W, H, ColorType.CMYK)
    im = decode(out)
    assert im.mode == "CMYK"
    dec = np.asarray(im).astype(np.int32)
    assert np.abs(dec - img.astype(np.int32)).max() < 20
    # Adobe APP14 transform-unknown marker present.
    assert b"Adobe\x00\x00\x00\x00\x00\x00\x00" in out


def test_cmyk_as_ycck():
    img = gradient_cmyk()
    out = Encoder(100).encode(img.tobytes(), W, H, ColorType.CMYK_AS_YCCK)
    im = decode(out)
    assert im.mode == "CMYK"
    dec = np.asarray(im).astype(np.int32)
    assert np.abs(dec - img.astype(np.int32)).max() < 20
    assert b"Adobe\x00\x00\x00\x00\x00\x00\x02" in out


def test_ycck():
    cmyk = gradient_cmyk()
    ycck = np.zeros_like(cmyk)
    for i in range(H):
        for j in range(W):
            ycck[i, j] = cmyk_to_ycck(*(int(v) for v in cmyk[i, j]))
    out = Encoder(100).encode(ycck.tobytes(), W, H, ColorType.YCCK)
    dec = np.asarray(decode(out)).astype(np.int32)
    assert np.abs(dec - cmyk.astype(np.int32)).max() < 20


def test_ycbcr_passthrough():
    img = gradient_rgb()
    from tpuenc import rgb_to_ycbcr

    ycbcr = np.zeros_like(img)
    for i in range(H):
        for j in range(W):
            ycbcr[i, j] = rgb_to_ycbcr(*(int(v) for v in img[i, j]))
    out = Encoder(90).encode(ycbcr.tobytes(), W, H, ColorType.YCBCR)
    check(out, img, "RGB")


def test_app_segment():
    out, _ = encode_rgb(
        80, lambda e: e.add_app_segment(15, b"HOHOHO\0")
    )
    assert b"\xff\xef\x00\x09HOHOHO\x00" in out


def test_icc_profile_roundtrip():
    # 128 KiB pseudo-profile must chunk into APP2 and round-trip through
    # the decoder byte-identically (lib.rs:507-539).
    icc = bytes((i * 7 + (i >> 8)) & 0xFF for i in range(128 * 1024))
    out, _ = encode_rgb(80, lambda e: e.add_icc_profile(icc))
    im = decode(out)
    assert im.info.get("icc_profile") == icc


def test_exif():
    out, _ = encode_rgb(80, lambda e: e.add_exif_metadata(b"MM\x00\x2a"))
    assert b"Exif\x00\x00MM\x00\x2a" in out


def test_density_dpi():
    from tpuenc import PixelDensity

    out, _ = encode_rgb(80, lambda e: e.set_density(PixelDensity.dpi(300)))
    im = decode(out)
    assert im.info.get("dpi") == (300, 300)


def test_1x1_optimized():
    # Degenerate 1x1 regression for optimized tables (lib.rs:542-553).
    img = np.array([[[200, 100, 50]]], dtype=np.uint8)
    enc = Encoder(100)
    enc.set_optimized_huffman_tables(True)
    out = enc.encode(img.tobytes(), 1, 1, ColorType.RGB)
    dec = np.asarray(decode(out).convert("RGB")).astype(np.int32)
    assert np.abs(dec - img.astype(np.int32)).max() < 20


def test_tiny_images_all_modes():
    for w, h in [(1, 1), (1, 17), (17, 1), (8, 8), (9, 9)]:
        img = gradient_rgb(w, h)
        for setup in [
            lambda e: None,
            lambda e: e.set_progressive(True),
            lambda e: e.set_optimized_huffman_tables(True),
        ]:
            enc = Encoder(85)
            setup(enc)
            out = enc.encode(img.tobytes(), w, h, ColorType.RGB)
            im = decode(out)
            assert im.size == (w, h)
