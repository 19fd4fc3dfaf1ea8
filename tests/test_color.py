"""Color conversion golden-vector tests.

Vectors match the reference's libjpeg-pinned test set
(image_buffer.rs:315-423) plus an exhaustive sweep against the scalar
formula — the conversion must be bit-exact."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpuenc import cmyk_to_ycck, rgb_to_ycbcr
from tpuenc.kernels import color_convert
from tpuenc.core.types import ColorType

# (rgb, ycbcr) golden pairs; primaries plus libjpeg-derived samples
# (reference image_buffer.rs:325-421).
GOLDEN = [
    ((0, 0, 0), (0, 128, 128)),
    ((255, 255, 255), (255, 128, 128)),
    ((255, 0, 0), (76, 85, 255)),
    ((0, 255, 0), (150, 44, 21)),
    ((0, 0, 255), (29, 255, 107)),
    ((59, 109, 6), (82, 85, 111)),
    ((29, 60, 11), (45, 109, 116)),
    ((57, 114, 26), (87, 94, 107)),
    ((30, 60, 6), (45, 106, 117)),
    ((41, 75, 11), (58, 102, 116)),
    ((145, 184, 108), (164, 97, 115)),
    ((33, 85, 7), (61, 98, 108)),
    ((61, 90, 40), (76, 108, 118)),
    ((75, 127, 45), (102, 96, 109)),
    ((30, 56, 14), (43, 111, 118)),
    ((106, 142, 81), (124, 104, 115)),
    ((35, 59, 11), (46, 108, 120)),
    ((170, 203, 123), (184, 94, 118)),
    ((45, 87, 16), (66, 100, 113)),
    ((59, 109, 21), (84, 92, 110)),
    ((100, 167, 36), (132, 74, 105)),
    ((17, 53, 5), (37, 110, 114)),
    ((226, 244, 220), (236, 119, 121)),
    ((192, 214, 120), (197, 85, 125)),
    ((63, 107, 22), (84, 93, 113)),
    ((44, 78, 19), (61, 104, 116)),
    ((72, 106, 54), (90, 108, 115)),
    ((99, 123, 73), (110, 107, 120)),
    ((188, 216, 148), (200, 99, 120)),
    ((19, 46, 7), (33, 113, 118)),
    ((56, 95, 40), (77, 107, 113)),
    ((81, 120, 56), (101, 103, 114)),
    ((9, 30, 0), (20, 117, 120)),
    ((90, 118, 46), (101, 97, 120)),
    ((24, 52, 0), (38, 107, 118)),
    ((32, 69, 9), (51, 104, 114)),
    ((74, 134, 33), (105, 88, 106)),
    ((37, 74, 7), (55, 101, 115)),
    ((69, 119, 31), (94, 92, 110)),
    ((63, 112, 21), (87, 91, 111)),
    ((90, 148, 17), (116, 72, 110)),
    ((50, 97, 30), (75, 102, 110)),
    ((99, 129, 72), (114, 105, 118)),
    ((161, 196, 57), (170, 64, 122)),
    ((10, 26, 1), (18, 118, 122)),
    ((87, 128, 68), (109, 105, 112)),
    ((111, 155, 73), (132, 94, 113)),
    ((33, 75, 11), (55, 103, 112)),
    ((70, 122, 51), (98, 101, 108)),
    ((22, 74, 3), (50, 101, 108)),
    ((88, 142, 45), (115, 89, 109)),
    ((66, 107, 40), (87, 101, 113)),
    ((18, 45, 0), (32, 110, 118)),
    ((163, 186, 88), (168, 83, 124)),
    ((47, 104, 4), (76, 88, 108)),
    ((147, 211, 114), (181, 90, 104)),
    ((42, 77, 18), (60, 104, 115)),
    ((37, 72, 6), (54, 101, 116)),
    ((84, 140, 55), (114, 95, 107)),
    ((46, 98, 25), (74, 100, 108)),
    ((48, 97, 20), (74, 98, 110)),
    ((189, 224, 156), (206, 100, 116)),
    ((36, 83, 0), (59, 94, 111)),
    ((159, 186, 114), (170, 97, 120)),
    ((75, 118, 46), (97, 99, 112)),
    ((193, 233, 158), (212, 97, 114)),
    ((76, 116, 48), (96, 101, 114)),
    ((108, 157, 79), (133, 97, 110)),
    ((180, 208, 155), (194, 106, 118)),
    ((74, 126, 53), (102, 100, 108)),
    ((72, 123, 46), (99, 98, 109)),
    ((71, 123, 34), (97, 92, 109)),
    ((130, 184, 72), (155, 81, 110)),
    ((30, 61, 17), (47, 111, 116)),
    ((27, 71, 0), (50, 100, 112)),
    ((45, 73, 24), (59, 108, 118)),
    ((139, 175, 93), (155, 93, 117)),
    ((11, 38, 0), (26, 114, 118)),
    ((34, 87, 15), (63, 101, 107)),
    ((43, 76, 35), (61, 113, 115)),
    ((18, 35, 7), (27, 117, 122)),
    ((69, 97, 48), (83, 108, 118)),
    ((139, 176, 50), (151, 71, 120)),
    ((21, 51, 7), (37, 111, 117)),
    ((209, 249, 189), (230, 105, 113)),
    ((32, 66, 14), (50, 108, 115)),
    ((100, 143, 67), (121, 97, 113)),
    ((40, 96, 14), (70, 96, 107)),
    ((88, 130, 64), (110, 102, 112)),
    ((52, 112, 14), (83, 89, 106)),
    ((49, 72, 25), (60, 108, 120)),
    ((144, 193, 75), (165, 77, 113)),
    ((49, 94, 1), (70, 89, 113)),
]


def test_scalar_golden_vectors():
    for rgb, expected in GOLDEN:
        assert rgb_to_ycbcr(*rgb) == expected, rgb


def test_device_matches_golden():
    import jax.numpy as jnp

    rgb = np.array([g[0] for g in GOLDEN], dtype=np.uint8)
    want = np.array([g[1] for g in GOLDEN], dtype=np.int32)
    y, cb, cr = color_convert.rgb_to_ycbcr(
        jnp.asarray(rgb[:, 0]), jnp.asarray(rgb[:, 1]), jnp.asarray(rgb[:, 2])
    )
    got = np.stack([np.asarray(y), np.asarray(cb), np.asarray(cr)], axis=1)
    np.testing.assert_array_equal(got, want)


def test_device_matches_scalar_randomized():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(5000, 3), dtype=np.uint8)
    import jax.numpy as jnp

    y, cb, cr = color_convert.rgb_to_ycbcr(
        jnp.asarray(rgb[:, 0]), jnp.asarray(rgb[:, 1]), jnp.asarray(rgb[:, 2])
    )
    for i in range(rgb.shape[0]):
        want = rgb_to_ycbcr(*(int(v) for v in rgb[i]))
        assert (int(y[i]), int(cb[i]), int(cr[i])) == want


def test_cmyk_to_ycck():
    assert cmyk_to_ycck(255, 255, 255, 0) == (255, 128, 128, 255)
    assert cmyk_to_ycck(0, 0, 0, 255) == (0, 128, 128, 0)


def test_plane_mappings():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    rgba = np.concatenate([rgb, rng.integers(0, 256, (4, 6, 1), np.uint8)], -1)
    bgr = rgb[..., ::-1].copy()

    y1, cb1, cr1 = color_convert.to_planes(jnp.asarray(rgb), ColorType.RGB)
    y2, cb2, cr2 = color_convert.to_planes(jnp.asarray(rgba), ColorType.RGBA)
    y3, cb3, cr3 = color_convert.to_planes(jnp.asarray(bgr), ColorType.BGR)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))
    np.testing.assert_array_equal(np.asarray(cb1), np.asarray(cb3))

    cmyk = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    planes = color_convert.to_planes(jnp.asarray(cmyk), ColorType.CMYK)
    np.testing.assert_array_equal(
        np.asarray(planes[0]), 255 - cmyk[..., 0].astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(planes[3]), 255 - cmyk[..., 3].astype(np.int32)
    )

    ycck = color_convert.to_planes(jnp.asarray(cmyk), ColorType.CMYK_AS_YCCK)
    yy, _, _ = color_convert.rgb_to_ycbcr(
        jnp.asarray(cmyk[..., 0]), jnp.asarray(cmyk[..., 1]), jnp.asarray(cmyk[..., 2])
    )
    np.testing.assert_array_equal(np.asarray(ycck[0]), np.asarray(yy))
    np.testing.assert_array_equal(
        np.asarray(ycck[3]), 255 - cmyk[..., 3].astype(np.int32)
    )
