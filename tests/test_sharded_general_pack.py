"""Generalized fully-sharded device entropy: every stripe packs every
scan on its device for ANY mode — no restart alignment required — and the
result is byte-identical to the single-device encoder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.shard.encode import ShardedEncoder
from tpuenc.shard.mesh import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _img(w, h, seed=0, ch=3):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _compare(setup, w, h, ct=ColorType.RGB, seed=0, ch=3, quality=85):
    mesh = make_mesh(8, batch=1)
    img = _img(w, h, seed=seed, ch=ch)

    enc = ShardedEncoder(quality, mesh)
    setup(enc)
    outs = enc.encode_batch_packed_general([img], w, h, ct)
    assert outs is not None, "general pack declined unexpectedly"

    ref = Encoder(quality)
    setup(ref)
    want = ref.encode(img, w, h, ct)
    assert outs[0] == want


W, H = 48, 16 * 9  # 9 MCU rows over 8 stripes -> padded last stripe


@needs_devices
def test_general_interleaved_no_restart():
    # The old packed path required a restart interval; the general path
    # packs a single segment whose DC chain crosses all stripes.
    _compare(lambda e: None, W, H)


@needs_devices
def test_general_interleaved_unaligned_restart():
    # Restart interval that does NOT divide the stripe MCU count.
    _compare(lambda e: e.set_restart_interval(7), W, H)


@needs_devices
def test_general_sequential_factor4():
    _compare(lambda e: e.set_sampling_factor(SamplingFactor.F_4_1),
             64, 16 * 9)


@needs_devices
@pytest.mark.slow  # progressive sharding also runs in the driver's
# multichip dryrun every round (__graft_entry__.dryrun_multichip)
def test_general_progressive():
    def setup(e):
        e.set_progressive_scans(4)
        e.set_restart_interval(3)

    _compare(setup, W, H)


@needs_devices
@pytest.mark.slow
def test_general_optimized():
    _compare(lambda e: e.set_optimized_huffman_tables(True), W, H)


@needs_devices
def test_general_optimized_progressive_batch():
    mesh = make_mesh(8, batch=2)
    w, h = 32, 16 * 4
    imgs = [_img(w, h, seed=i) for i in range(2)]
    enc = ShardedEncoder(90, mesh)
    enc.set_progressive_scans(3)
    enc.set_optimized_huffman_tables(True)
    outs = enc.encode_batch_packed_general(imgs, w, h, ColorType.RGB)
    assert outs is not None
    for im, out in zip(imgs, outs):
        ref = Encoder(90)
        ref.set_progressive_scans(3)
        ref.set_optimized_huffman_tables(True)
        assert out == ref.encode(im, w, h, ColorType.RGB)


@needs_devices
def test_general_luma():
    _compare(lambda e: None, 40, 8 * 9, ct=ColorType.LUMA, ch=1)


@needs_devices
def test_general_declines_unaligned_dims():
    mesh = make_mesh(8, batch=1)
    img = _img(30, 130)
    enc = ShardedEncoder(85, mesh)
    assert enc.encode_batch_packed_general([img], 30, 130,
                                           ColorType.RGB) is None
