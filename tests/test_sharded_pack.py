"""Fully-sharded device entropy: each stripe packs its bitstream on its own
device; host assembly is byte-aligned segment concatenation with
globally-numbered RST markers.  Must be byte-identical to the single-device
encoder (SURVEY §2: restart segments as the multi-host parallelism seam)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpuenc import ColorType, Encoder
from tpuenc.shard.encode import ShardedEncoder
from tpuenc.shard.mesh import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
@pytest.mark.parametrize("interval", [1, 2, 4, 8])
def test_packed_stripes_match_single(interval):
    mesh = make_mesh(8, batch=1)
    w, h = 64, 16 * 8 * 2  # 8 MCUs per stripe at 2x2 sampling
    rng = np.random.default_rng(interval)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    enc = ShardedEncoder(80, mesh)
    enc.set_restart_interval(interval)
    outs = enc.encode_batch_packed([img], w, h, ColorType.RGB)
    assert outs is not None

    ref = Encoder(80)
    ref.set_restart_interval(interval)
    assert outs[0] == ref.encode(img, w, h, ColorType.RGB)


@needs_devices
@pytest.mark.slow
def test_packed_stripes_batch_axis():
    mesh = make_mesh(8, batch=2)
    w, h = 32, 16 * 4 * 2
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(2)]
    enc = ShardedEncoder(80, mesh)
    enc.set_restart_interval(2)
    outs = enc.encode_batch_packed(imgs, w, h, ColorType.RGB)
    assert outs is not None
    for im, out in zip(imgs, outs):
        e = Encoder(80)
        e.set_restart_interval(2)
        assert out == e.encode(im, w, h, ColorType.RGB)


@needs_devices
def test_packed_declines_when_unaligned():
    mesh = make_mesh(8, batch=1)
    enc = ShardedEncoder(80, mesh)
    enc.set_restart_interval(3)  # does not divide stripe MCU count
    img = np.zeros((16 * 8 * 2, 64, 3), np.uint8)
    assert enc.encode_batch_packed([img], 64, 16 * 8 * 2, ColorType.RGB) is None
    enc2 = ShardedEncoder(80, mesh)  # no restart interval at all
    assert enc2.encode_batch_packed([img], 64, 16 * 8 * 2, ColorType.RGB) is None
