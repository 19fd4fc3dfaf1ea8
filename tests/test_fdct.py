"""Forward-DCT golden-vector tests.

The two input/output blocks are captured from libjpeg's ``jpeg_fdct_islow``
for a typical image — the same vectors the reference pins bit-exactness to
(fdct.rs:240-286).  Exact equality required."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tpuenc.kernels.fdct import fdct_blocks

INPUT1 = np.array([
    -70, -71, -70, -68, -67, -67, -67, -67, -72, -73, -72, -70, -69, -69, -68,
    -69, -75, -76, -74, -73, -73, -72, -71, -70, -77, -78, -77, -75, -76, -75,
    -73, -71, -78, -77, -77, -76, -79, -77, -76, -75, -78, -78, -77, -77, -77,
    -77, -78, -77, -79, -79, -78, -78, -78, -78, -79, -78, -80, -79, -78, -78,
    -81, -80, -78, -76,
], dtype=np.int32).reshape(8, 8)

OUTPUT1 = np.array([
    -4786, -66, 2, -18, 12, 12, 5, -7, 223, -37, -8, 21, 8, 5, -4, 6, 60, 6,
    -10, 5, 0, -2, -1, 5, 21, 21, -15, 12, -2, -7, 1, 0, -2, -5, 16, -15, 0,
    5, -4, -8, 0, -7, -4, 6, 7, -4, 5, 4, 3, 0, 1, -5, 0, -1, 4, 1, -5, 7, 0,
    -3, -6, 1, 1, -4,
], dtype=np.int32).reshape(8, 8)

INPUT2 = np.array([
    21, 28, 11, 24, -45, -37, -55, -103, 38, -8, 31, 17, -19, 49, 15, -76, 22,
    -48, -36, -31, -23, 35, -23, -72, 13, -30, -45, -42, -44, -15, -20, -44,
    13, -30, -45, -42, -44, -15, -20, -44, 13, -30, -45, -42, -44, -15, -20,
    -44, 13, -30, -45, -42, -44, -15, -20, -44, 13, -30, -45, -42, -44, -15,
    -20, -44,
], dtype=np.int32).reshape(8, 8)

OUTPUT2 = np.array([
    -1420, 717, 187, 910, -244, 579, 222, -191, 461, 487, -497, -29, -220,
    179, 63, -95, 213, 414, -235, -187, -108, 74, -73, -70, -63, 311, 13,
    -290, 17, -38, -180, -47, -254, 201, 116, -247, 102, -109, -185, -36,
    -310, 107, 73, -91, 126, -121, -99, -37, -253, 43, -15, 53, 101, -91, -3,
    -37, -136, 12, -44, 81, 53, -45, 31, -24,
], dtype=np.int32).reshape(8, 8)


def test_fdct_libjpeg_golden():
    blocks = jnp.asarray(np.stack([INPUT1, INPUT2]))
    out = np.asarray(fdct_blocks(blocks))
    np.testing.assert_array_equal(out[0], OUTPUT1)
    np.testing.assert_array_equal(out[1], OUTPUT2)


def test_fdct_batched_shapes():
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, size=(3, 5, 8, 8)).astype(np.int32)
    out = np.asarray(fdct_blocks(jnp.asarray(x)))
    assert out.shape == (3, 5, 8, 8)
    # Batch positions are independent: single-block results must match.
    single = np.asarray(fdct_blocks(jnp.asarray(x[1, 2][None])))
    np.testing.assert_array_equal(out[1, 2], single[0])


def test_fdct_dc_of_constant_block():
    # A constant block c has DC = c*64 (x8 scale / 8) and zero AC.
    for c in (-128, -1, 0, 77, 127):
        x = np.full((1, 8, 8), c, dtype=np.int32)
        out = np.asarray(fdct_blocks(jnp.asarray(x)))[0]
        assert out[0, 0] == c * 64
        assert (out.ravel()[1:] == 0).all()
