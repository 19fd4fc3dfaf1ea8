"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The reference has no multi-node story (SURVEY §2: strictly single-process);
this is new surface.  We verify the MCU-row-stripe sharded pipeline produces
blocks identical to the single-device pipeline, and that the psum'd
histogram path feeds the same optimized tables."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpuenc.core.types import ColorType, EncoderConfig, SamplingFactor
from tpuenc.kernels.pipeline import coefficients_fn
from tpuenc.shard.mesh import make_mesh
from tpuenc.shard.stripes import pad_for_stripes, stripe_encode_step


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
def test_stripe_parity_interleaved():
    mesh = make_mesh(8, batch=1)
    w, h = 64, 16 * 8 * 2  # 2 MCU rows per stripe at 2x2 sampling
    config = EncoderConfig(quality=85, sampling_factor=SamplingFactor.F_2_2)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, h, w, 3), dtype=np.uint8)

    sfn, geo = stripe_encode_step(w, h, ColorType.RGB, config, mesh)
    sharded = np.asarray(sfn(pad_for_stripes(img, geo))[0]).reshape(-1, 64)

    fn, _ = coefficients_fn(w, h, ColorType.RGB, config)
    single = np.asarray(fn(img[0])[0])

    np.testing.assert_array_equal(sharded, single)


@needs_devices
def test_stripe_parity_batch_axis():
    mesh = make_mesh(8, batch=2)
    w, h = 32, 16 * 4 * 3
    config = EncoderConfig(quality=75, sampling_factor=SamplingFactor.F_2_2)

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(4, h, w, 3), dtype=np.uint8)

    sfn, geo = stripe_encode_step(w, h, ColorType.RGB, config, mesh)
    sharded = np.asarray(sfn(pad_for_stripes(imgs, geo))[0])

    fn, _ = coefficients_fn(w, h, ColorType.RGB, config)
    for i in range(4):
        single = np.asarray(fn(imgs[i])[0])
        np.testing.assert_array_equal(sharded[i], single)


@needs_devices
def test_stripe_histograms_psum():
    mesh = make_mesh(8, batch=1)
    w, h = 32, 16 * 8
    config = EncoderConfig(
        quality=85,
        sampling_factor=SamplingFactor.F_2_2,
        optimize_huffman_table=True,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(1, h, w, 3), dtype=np.uint8)

    sfn, geo = stripe_encode_step(
        w, h, ColorType.RGB, config, mesh, with_histograms=True
    )
    coeff, hists = sfn(pad_for_stripes(img, geo))

    # Compare to host histograms over the same (sequential-layout) blocks.
    from tpuenc.core.types import init_components
    from tpuenc.entropy.huffopt import build_histograms

    comps = init_components(ColorType.RGB.jpeg_color_type, config.sampling_factor)
    comp_blocks = [np.asarray(c).reshape(-1, 64) for c in coeff]
    host = build_histograms(comp_blocks, comps, None)

    for (hdc, hac), (ddc, dac) in zip(host, hists):
        # Device path seeds freq[256] later; DC chain is boundary-exact via
        # ppermute, so bins 0..255 must match the serial host histogram.
        # Histograms are per-image: (B, 257).
        np.testing.assert_array_equal(hdc[:256], np.asarray(ddc)[0, :256])
        np.testing.assert_array_equal(hac[:256], np.asarray(dac)[0, :256])


@needs_devices
def test_mesh_shapes():
    mesh = make_mesh(8, batch=2)
    assert mesh.shape["batch"] == 2 and mesh.shape["stripe"] == 4
    with pytest.raises(ValueError):
        make_mesh(8, batch=3)
