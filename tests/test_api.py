"""API surface tests: setters, error cases, config plumbing (reference
encoder.rs:277-435 setters, error.rs variants, encoder.rs:1302-1331)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from tpuenc import (
    ColorType,
    Encoder,
    PixelDensity,
    PixelDensityUnit,
    SamplingFactor,
)
from tpuenc.core import errors
from tpuenc.core.types import JpegColorType, init_components


def test_sampling_factor_packing():
    # encoder.rs:1302-1321
    assert SamplingFactor.F_1_1.get_sampling_factors() == (1, 1)
    assert SamplingFactor.F_2_1.get_sampling_factors() == (2, 1)
    assert SamplingFactor.F_1_2.get_sampling_factors() == (1, 2)
    assert SamplingFactor.F_2_2.get_sampling_factors() == (2, 2)
    assert SamplingFactor.F_4_1.get_sampling_factors() == (4, 1)
    assert SamplingFactor.F_4_2.get_sampling_factors() == (4, 2)
    assert SamplingFactor.F_1_4.get_sampling_factors() == (1, 4)
    assert SamplingFactor.F_2_4.get_sampling_factors() == (2, 4)
    assert SamplingFactor.R_4_4_4.get_sampling_factors() == (1, 1)
    assert SamplingFactor.R_4_4_0.get_sampling_factors() == (1, 2)
    assert SamplingFactor.R_4_4_1.get_sampling_factors() == (1, 4)
    assert SamplingFactor.R_4_2_2.get_sampling_factors() == (2, 1)
    assert SamplingFactor.R_4_2_0.get_sampling_factors() == (2, 2)
    assert SamplingFactor.R_4_2_1.get_sampling_factors() == (2, 4)
    assert SamplingFactor.R_4_1_1.get_sampling_factors() == (4, 1)
    assert SamplingFactor.R_4_1_0.get_sampling_factors() == (4, 2)


def test_from_factors():
    assert SamplingFactor.from_factors(2, 2) is SamplingFactor.F_2_2
    assert SamplingFactor.from_factors(3, 1) is None


def test_supports_interleaved():
    assert SamplingFactor.F_2_2.supports_interleaved()
    assert SamplingFactor.R_4_2_0.supports_interleaved()
    assert not SamplingFactor.F_4_1.supports_interleaved()
    assert not SamplingFactor.F_2_4.supports_interleaved()


def test_default_sampling_by_quality():
    # encoder.rs:256-260: below 90 -> 2x2, else 1x1.
    assert Encoder(89).sampling_factor() is SamplingFactor.F_2_2
    assert Encoder(90).sampling_factor() is SamplingFactor.F_1_1


def test_set_progressive_default_scans():
    # encoder.rs:1323-1331
    e = Encoder(100)
    e.set_progressive(True)
    assert e.progressive_scans() == 4
    e.set_progressive(False)
    assert e.progressive_scans() is None
    with pytest.raises(ValueError):
        e.set_progressive_scans(1)
    with pytest.raises(ValueError):
        e.set_progressive_scans(65)


def test_restart_interval_zero_clears():
    e = Encoder(90)
    e.set_restart_interval(32)
    assert e.restart_interval() == 32
    e.set_restart_interval(0)
    assert e.restart_interval() is None


def test_density_default_and_dpi():
    assert Encoder(90).density() == PixelDensity(
        (1, 1), PixelDensityUnit.PIXEL_ASPECT_RATIO
    )
    assert PixelDensity.dpi(300) == PixelDensity((300, 300), PixelDensityUnit.INCHES)


def test_app_segment_validation():
    e = Encoder(90)
    with pytest.raises(errors.InvalidAppSegment):
        e.add_app_segment(0, b"x")
    with pytest.raises(errors.InvalidAppSegment):
        e.add_app_segment(16, b"x")
    with pytest.raises(errors.AppSegmentTooLarge):
        e.add_app_segment(5, b"x" * 65534)
    e.add_app_segment(5, b"x" * 65533)


def test_icc_too_large():
    e = Encoder(90)
    with pytest.raises(errors.IccTooLarge):
        e.add_icc_profile(b"\0" * (255 * 65519))


def test_bad_image_data():
    e = Encoder(90)
    with pytest.raises(errors.BadImageData):
        e.encode(b"\0" * 10, 10, 10, ColorType.RGB)


def test_zero_dimensions():
    with pytest.raises(errors.ZeroImageDimensions):
        Encoder(90).encode(b"", 0, 0, ColorType.LUMA)


def test_dimensions_too_large():
    # The reference types dimensions as u16 (encoder.rs:443-446); beyond
    # 65535 must be a typed error, not a struct.pack crash in the SOF writer.
    e = Encoder(90)
    with pytest.raises(errors.DimensionsTooLarge):
        e.encode(b"\0" * (65536 * 3), 65536, 1, ColorType.RGB)
    with pytest.raises(errors.DimensionsTooLarge):
        e.encode(b"\0" * (70000 * 3), 1, 70000, ColorType.RGB)


def test_write_error_typed(tmp_path):
    # Failing sinks surface as the typed WriteError (error.rs:31-35).
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = Encoder.new_file(tmp_path / "no_such_dir" / "out.jpg", 90)
    with pytest.raises(errors.WriteError):
        enc.encode(img.tobytes(), 8, 8, ColorType.RGB)

    class BrokenSink:
        def write(self, data):
            raise OSError("disk full")

    enc = Encoder.new_writer(BrokenSink(), 90)
    with pytest.raises(errors.WriteError):
        enc.encode(img.tobytes(), 8, 8, ColorType.RGB)


def test_component_table_mapping():
    # encoder.rs:569-619 mapping quirks.
    ycbcr = init_components(JpegColorType.YCBCR, SamplingFactor.F_2_2)
    assert [c.quantization_table for c in ycbcr] == [0, 1, 1]
    assert (ycbcr[0].horizontal_sampling_factor, ycbcr[0].vertical_sampling_factor) == (2, 2)
    assert (ycbcr[1].horizontal_sampling_factor, ycbcr[1].vertical_sampling_factor) == (1, 1)

    cmyk = init_components(JpegColorType.CMYK, SamplingFactor.F_2_2)
    assert [c.quantization_table for c in cmyk] == [1, 1, 1, 0]
    assert (cmyk[3].horizontal_sampling_factor, cmyk[3].vertical_sampling_factor) == (2, 2)

    ycck = init_components(JpegColorType.YCCK, SamplingFactor.F_2_2)
    assert [c.quantization_table for c in ycck] == [0, 1, 1, 0]
    assert (ycck[0].horizontal_sampling_factor, ycck[3].horizontal_sampling_factor) == (2, 2)


def test_new_file(tmp_path):
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    path = tmp_path / "out.jpg"
    enc = Encoder.new_file(path, 90)
    data = enc.encode(img.tobytes(), 16, 16, ColorType.RGB)
    assert path.read_bytes() == data


def test_encode_batch_luma_matches_singles(monkeypatch):
    """Batched grayscale rides the device batch path with (N, H, W)
    pixels — no channel axis.  Regression: to_planes stripped the last
    axis as channels, silently corrupting batched LUMA output at sizes
    where the mangled shapes still traced (1x1: second image's scan
    payload vanished; found by the encode_batch fuzz)."""
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "1")
    rng = np.random.default_rng(11)
    for n, w, h in [(2, 1, 1), (3, 16, 16)]:
        imgs = [rng.integers(0, 256, (h, w), np.uint8) for _ in range(n)]
        batch = Encoder(80).encode_batch(imgs, w, h, ColorType.LUMA)
        singles = [
            Encoder(80).encode(im, w, h, ColorType.LUMA) for im in imgs
        ]
        assert batch == singles, (n, w, h)


def test_encode_batch_honors_writer_sink():
    """encode_batch must feed a configured sink per image, exactly like
    encode() does (device and host paths agree)."""
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
        for _ in range(3)
    ]

    class Sink:
        def __init__(self):
            self.chunks = []

        def write(self, b):
            self.chunks.append(bytes(b))

    sink = Sink()
    enc = Encoder.new_writer(sink, 90)
    outs = enc.encode_batch([i.tobytes() for i in imgs], 16, 24, ColorType.RGB)
    assert sink.chunks == outs


def test_encode_image_custom_buffer():
    from PIL import Image
    import io
    from tpuenc import ImageBuffer

    rng = np.random.default_rng(0)
    planes = rng.integers(0, 256, size=(3, 24, 31), dtype=np.uint8)

    class Buf(ImageBuffer):
        def get_jpeg_color_type(self):
            return JpegColorType.YCBCR

        def width(self):
            return 31

        def height(self):
            return 24

        def to_planes(self):
            return tuple(planes)

    out = Encoder(95).encode_image(Buf())
    im = Image.open(io.BytesIO(out))
    assert im.size == (31, 24)


def test_encode_image_converting_rgb_buffer():
    """A user buffer declaring color_type() = RGB supplies raw R/G/B
    planes and encode_image runs the same color conversion as encode()
    — byte-identical output (reference image_buffer.rs:135-204: trait
    impls convert inside fill_buffers; VERDICT r3 missing #3)."""
    from tpuenc import ColorType, ImageBuffer

    rng = np.random.default_rng(7)
    h, w = 26, 33
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    class RgbBuf(ImageBuffer):
        def get_jpeg_color_type(self):
            return JpegColorType.YCBCR

        def color_type(self):
            return ColorType.RGB

        def width(self):
            return w

        def height(self):
            return h

        def to_planes(self):
            return (img[..., 0], img[..., 1], img[..., 2])

    enc = Encoder(88)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    got = Encoder(88).encode_image(RgbBuf())
    assert got == want


def test_encode_image_converting_buffer_mismatch():
    """color_type() whose JPEG colorspace disagrees with
    get_jpeg_color_type() is a usage error."""
    from tpuenc import ColorType, ImageBuffer

    class BadBuf(ImageBuffer):
        def get_jpeg_color_type(self):
            return JpegColorType.CMYK

        def color_type(self):
            return ColorType.RGB

        def width(self):
            return 8

        def height(self):
            return 8

        def to_planes(self):
            return (np.zeros((8, 8), np.uint8),) * 3

    with pytest.raises(ValueError):
        Encoder(90).encode_image(BadBuf())
