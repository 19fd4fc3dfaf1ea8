"""End-to-end mesh-sharded encode must be byte-identical to the
single-device encoder for every mode (virtual 8-device CPU mesh)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.shard.encode import ShardedEncoder, sharded_encode
from tpuenc.shard.mesh import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@needs_devices
@pytest.mark.parametrize(
    "setup",
    [
        lambda e: None,
        lambda e: e.set_restart_interval(5),
        pytest.param(lambda e: e.set_progressive(True),
                     marks=pytest.mark.slow),
        pytest.param(lambda e: e.set_optimized_huffman_tables(True),
                     marks=pytest.mark.slow),
        lambda e: e.set_sampling_factor(SamplingFactor.F_1_1),
    ],
)
def test_sharded_matches_single(setup):
    mesh = make_mesh(8, batch=1)
    w, h = 48, 16 * 8 * 2  # MCU-aligned, 2 MCU rows per stripe at 2x2
    img = _img(w, h)

    enc = ShardedEncoder(80, mesh)
    setup(enc)
    sharded = enc.encode(img, w, h, ColorType.RGB)

    ref = Encoder(80)
    setup(ref)
    single = ref.encode(img, w, h, ColorType.RGB)
    assert sharded == single


@needs_devices
def test_sharded_uneven_stripes():
    # num_rows not divisible by n_stripes: padding MCU rows must be trimmed.
    mesh = make_mesh(8, batch=1)
    w, h = 32, 16 * 11  # 11 MCU rows over 8 stripes
    img = _img(w, h, seed=3)
    out = sharded_encode(img, w, h, ColorType.RGB, mesh, quality=85)
    single = Encoder(85).encode(img, w, h, ColorType.RGB)
    assert out == single


@needs_devices
def test_sharded_batch_axis():
    mesh = make_mesh(8, batch=2)
    w, h = 32, 16 * 4
    imgs = [_img(w, h, seed=i) for i in range(4)]
    enc = ShardedEncoder(75, mesh)
    outs = enc.encode_batch_sharded(imgs, w, h, ColorType.RGB)
    for im, out in zip(imgs, outs):
        assert out == Encoder(75).encode(im, w, h, ColorType.RGB)


@needs_devices
def test_sharded_optimized_batch_gt_one_per_device():
    """Per-image device histograms: with >1 image per device the DC chains
    must NOT leak across images (regression for the cross-image chaining
    bug in the round-1 psum path)."""
    mesh = make_mesh(8, batch=2)
    w, h = 32, 16 * 4
    # Wildly different DC levels per image so cross-image chaining would
    # visibly skew the DC histograms and change the optimized tables.
    imgs = []
    for i in range(4):
        base = np.full((h, w, 3), 32 + 60 * i, np.uint8)
        imgs.append(base + _img(w, h, seed=i) // 8)
    enc = ShardedEncoder(85, mesh)
    enc.set_optimized_huffman_tables(True)
    outs = enc.encode_batch_sharded(imgs, w, h, ColorType.RGB)
    for im, out in zip(imgs, outs):
        ref = Encoder(85)
        ref.set_optimized_huffman_tables(True)
        assert out == ref.encode(im, w, h, ColorType.RGB)


@needs_devices
def test_sharded_optimized_uneven_stripes():
    """Stripe-alignment padding rows must not contribute histogram symbols."""
    mesh = make_mesh(8, batch=1)
    w, h = 32, 16 * 11  # 11 MCU rows over 8 stripes -> last stripe padded
    img = _img(w, h, seed=5)

    def setup(e):
        e.set_optimized_huffman_tables(True)

    out = sharded_encode(img, w, h, ColorType.RGB, mesh, quality=85,
                         configure=setup)
    ref = Encoder(85)
    setup(ref)
    assert out == ref.encode(img, w, h, ColorType.RGB)


@needs_devices
def test_sharded_optimized_progressive():
    mesh = make_mesh(8, batch=1)
    w, h = 48, 16 * 8
    img = _img(w, h, seed=6)

    def setup(e):
        e.set_progressive_scans(3)
        e.set_optimized_huffman_tables(True)

    enc = ShardedEncoder(90, mesh)
    setup(enc)
    out = enc.encode(img, w, h, ColorType.RGB)
    ref = Encoder(90)
    setup(ref)
    assert out == ref.encode(img, w, h, ColorType.RGB)


@needs_devices
def test_sharded_rejects_unaligned():
    mesh = make_mesh(8, batch=1)
    img = _img(30, 130)
    with pytest.raises(ValueError):
        sharded_encode(img, 30, 130, ColorType.RGB, mesh)


@needs_devices
def test_multihost_gather_path(monkeypatch):
    """The multihost_utils byte-gather path (fetch_global) produces the
    same bytes as the direct single-process fetch.  Real multi-host runs
    are out of scope here; this forces the gather code path under a
    single process (VERDICT #8 / SURVEY §5 distributed-comm row)."""
    mesh = make_mesh(8, batch=1)
    w, h = 48, 16 * 8 * 2
    img = _img(w, h)

    enc = ShardedEncoder(80, mesh)
    enc.set_restart_interval(4)
    want = enc.encode(img, w, h, ColorType.RGB)

    monkeypatch.setenv("TPUENC_FORCE_MULTIHOST_GATHER", "1")
    enc2 = ShardedEncoder(80, mesh)
    enc2.set_restart_interval(4)
    got = enc2.encode(img, w, h, ColorType.RGB)
    assert got == want

    # Optimized tables: histogram fetches ride the gather too.
    enc3 = ShardedEncoder(80, mesh)
    enc3.set_optimized_huffman_tables(True)
    got_opt = enc3.encode(img, w, h, ColorType.RGB)
    monkeypatch.delenv("TPUENC_FORCE_MULTIHOST_GATHER")
    enc4 = ShardedEncoder(80, mesh)
    enc4.set_optimized_huffman_tables(True)
    assert got_opt == enc4.encode(img, w, h, ColorType.RGB)
