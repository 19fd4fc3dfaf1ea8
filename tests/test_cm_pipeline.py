"""Coefficient-major (cm) pipeline parity.

The TPU-default fused path runs the whole program in (64, lanes) layout:
``raw_fn_cm`` coefficients feed ``device_scan_pack(cm=True)`` with no
blockify / MCU-order / pack transposes.  These tests force the Pallas
fDCT on (interpret mode on CPU) so ``raw_fn_cm`` exists, and assert:

* the cm coefficient streams are exactly the transposed block-major
  streams for every mode / sampling factor / shape, batched included;
* full Encoder output through the cm fused path is byte-identical to the
  host oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.core.types import EncoderConfig


@pytest.fixture
def cm_env(monkeypatch):
    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "1")
    monkeypatch.setenv("TPUENC_PACK", "v2")
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")


CASES = [
    pytest.param(
        "f11",
        EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_1_1),
        37, 22, marks=pytest.mark.slow),
    pytest.param(
        "f22", EncoderConfig(quality=80, sampling_factor=SamplingFactor.F_2_2),
        70, 46, marks=pytest.mark.slow),
    pytest.param(
        "f21_restart",
        EncoderConfig(quality=80, sampling_factor=SamplingFactor.F_2_1,
                      restart_interval=2),
        50, 18, marks=pytest.mark.slow),
    ("f14", EncoderConfig(quality=75, sampling_factor=SamplingFactor.F_1_4),
     24, 70),
    pytest.param(
        "progressive", EncoderConfig(quality=85, progressive_scans=3),
        40, 25, marks=pytest.mark.slow),
    pytest.param(
        "sequential_f41",
        EncoderConfig(quality=85, sampling_factor=SamplingFactor.F_4_1),
        66, 10, marks=pytest.mark.slow),
]


def _case_id(c):
    return c.values[0] if hasattr(c, "values") else c[0]


@pytest.mark.parametrize("name,config,w,h", CASES,
                         ids=[_case_id(c) for c in CASES])
def test_cm_streams_match_block_major(name, config, w, h, cm_env):
    from tpuenc.kernels.pipeline import coefficients_fn

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    fn, _ = coefficients_fn(w, h, ColorType.RGB, config)
    assert fn.raw_fn_cm is not None
    import jax

    bm = jax.jit(fn.raw_fn)(img)
    cm = jax.jit(fn.raw_fn_cm)(img)
    assert len(bm) == len(cm)
    for b, c in zip(bm, cm):
        np.testing.assert_array_equal(np.asarray(c).T, np.asarray(b))


@pytest.mark.slow
def test_cm_streams_batched(cm_env):
    from tpuenc.kernels.pipeline import coefficients_fn

    config = EncoderConfig(quality=88, sampling_factor=SamplingFactor.F_2_2)
    w, h = 40, 24
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, (3, h, w, 3), np.uint8)

    fn, _ = coefficients_fn(w, h, ColorType.RGB, config, batched=True)
    import jax

    bm = jax.jit(fn.raw_fn)(imgs)
    cm = jax.jit(fn.raw_fn_cm)(imgs)
    for b, c in zip(bm, cm):
        # block-major batched: (N, B, 64); cm: (64, N*B)
        flat = np.asarray(b).reshape(-1, 64)
        np.testing.assert_array_equal(np.asarray(c).T, flat)


@pytest.mark.parametrize("mode", [
    "baseline",
    pytest.param("f22_restart", marks=pytest.mark.slow),
    pytest.param("progressive", marks=pytest.mark.slow),
    pytest.param("sequential", marks=pytest.mark.slow),
])
def test_cm_fused_byte_parity(mode, cm_env, monkeypatch):
    rng = np.random.default_rng(23)
    w, h = 70, 46
    img = rng.integers(0, 256, (h, w, 3), np.uint8).tobytes()

    def build():
        enc = Encoder(90)
        if mode == "f22_restart":
            enc.set_sampling_factor(SamplingFactor.F_2_2)
            enc.set_restart_interval(3)
        elif mode == "progressive":
            enc.set_progressive_scans(4)
        elif mode == "sequential":
            enc.set_sampling_factor(SamplingFactor.F_4_1)
        return enc

    got = build().encode(img, w, h, ColorType.RGB)
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "0")
    want = build().encode(img, w, h, ColorType.RGB)
    assert got == want


@pytest.mark.slow
def test_cm_batch_fused_parity(cm_env, monkeypatch):
    from tpuenc.core.tables import default_tables
    from tpuenc.core.types import ColorType as CT
    from tpuenc.entropy.device_encode import device_encode_batch_fused

    rng = np.random.default_rng(5)
    w, h = 40, 24
    imgs = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    config = Encoder(90)._config()
    huffman = [list(t) for t in default_tables()]
    got = device_encode_batch_fused(imgs, w, h, CT.RGB, config, huffman)
    assert got is not None

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "0")
    for i in range(3):
        whole = Encoder(90).encode(imgs[i].tobytes(), w, h, CT.RGB)
        assert got[i][0] in whole
