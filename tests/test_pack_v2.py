"""End-to-end byte parity of the v2 (Pallas pipeline) device entropy path.

Runs the full Encoder with TPUENC_PACK=v2 (interpret mode on CPU) and
asserts the output is byte-identical to the host oracle path for every
encode mode, plus decoder validation.  Mirrors what test_device_entropy.py
does for the v1 XLA log-tree packer.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor


@pytest.fixture
def v2_device_entropy(monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setenv("TPUENC_PACK", "v2")


def _host_encode(build, img, w, h, ct, monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    out = build().encode(img, w, h, ct)
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    return out


CONFIGS = {
    "baseline": {},
    "q80_420_restart": dict(quality=80, sampling=SamplingFactor.F_2_2,
                            restart=3),
    "progressive": dict(progressive=4),
    "optimized": dict(quality=95, optimized=True),
    "factor4_sequential": dict(sampling=SamplingFactor.F_4_1),
    "optimized_progressive": dict(progressive=3, optimized=True, restart=5),
}


def _build(cfg):
    enc = Encoder(cfg.get("quality", 90))
    if "sampling" in cfg:
        enc.set_sampling_factor(cfg["sampling"])
    if "restart" in cfg:
        enc.set_restart_interval(cfg["restart"])
    if "progressive" in cfg:
        enc.set_progressive_scans(cfg["progressive"])
    if cfg.get("optimized"):
        enc.set_optimized_huffman_tables(True)
    return enc


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_v2_byte_parity(name, v2_device_entropy, monkeypatch):
    cfg = CONFIGS[name]
    rng = np.random.default_rng(17)
    w, h = 70, 46  # partial trailing MCUs in both dimensions
    img = rng.integers(0, 256, (h, w, 3), np.uint8).tobytes()

    got = _build(cfg).encode(img, w, h, ColorType.RGB)
    want = _host_encode(lambda: _build(cfg), img, w, h, ColorType.RGB,
                        monkeypatch)
    assert got == want


def test_v2_luma_and_cmyk(v2_device_entropy, monkeypatch):
    rng = np.random.default_rng(3)
    w, h = 33, 17
    gray = rng.integers(0, 256, (h, w), np.uint8).tobytes()
    got = Encoder(85).encode(gray, w, h, ColorType.LUMA)
    want = _host_encode(lambda: Encoder(85), gray, w, h, ColorType.LUMA,
                        monkeypatch)
    assert got == want

    cmyk = rng.integers(0, 256, (h, w, 4), np.uint8).tobytes()
    got = Encoder(85).encode(cmyk, w, h, ColorType.CMYK)
    want = _host_encode(lambda: Encoder(85), cmyk, w, h, ColorType.CMYK,
                        monkeypatch)
    assert got == want


def test_v2_decodes(v2_device_entropy):
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(11)
    w, h = 64, 48
    base = rng.integers(60, 196, (h, w, 3), np.uint8)
    out = _build(CONFIGS["q80_420_restart"]).encode(
        base.tobytes(), w, h, ColorType.RGB
    )
    decoded = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert decoded.shape == (h, w, 3)


def test_v2_batch_fused(v2_device_entropy, monkeypatch):
    from tpuenc.entropy.device_encode import device_encode_batch_fused
    from tpuenc.core.types import ColorType as CT

    rng = np.random.default_rng(5)
    w, h = 40, 24
    imgs = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    enc = Encoder(90)
    config = enc._config()
    from tpuenc.core.tables import default_tables

    huffman = [list(t) for t in default_tables()]
    got = device_encode_batch_fused(imgs, w, h, CT.RGB, config, huffman)
    assert got is not None

    # Reference: encode each image via the host path and extract the scan
    # payload by encoding through the public API and comparing suffixes.
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    for i in range(3):
        whole = Encoder(90).encode(imgs[i].tobytes(), w, h, CT.RGB)
        assert got[i][0] in whole


@pytest.mark.slow
@pytest.mark.parametrize("name", ["baseline", "q80_420_restart"])
def test_fused_sample_pack_parity(name, v2_device_entropy, monkeypatch):
    """Opt-in fused fDCT+quantize+DC-diff+P1 kernel (TPUENC_FUSED_P1=1,
    measured slower on v5e but kept byte-correct — device_encode notes):
    bytes must equal the host packer on interleaved configs including
    restarts and 4:2:0 per-lane quantization tables."""
    monkeypatch.setenv("TPUENC_FUSED_P1", "1")
    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "1")
    cfg = CONFIGS[name]
    rng = np.random.default_rng(23)
    w, h = 70, 46
    img = rng.integers(0, 256, (h, w, 3), np.uint8).tobytes()

    got = _build(cfg).encode(img, w, h, ColorType.RGB)
    want = _host_encode(lambda: _build(cfg), img, w, h, ColorType.RGB,
                        monkeypatch)
    assert got == want
