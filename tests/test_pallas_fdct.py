"""Pallas fused fDCT+quantize kernel: bit-exactness vs the XLA path
(interpret mode on CPU, compiled on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tpuenc.core.tables import quantization_table
from tpuenc.kernels.fdct import fdct_blocks
from tpuenc.kernels.pallas_fdct import fdct_quantize_pallas
from tpuenc.kernels.quantize import quantize_zigzag


@pytest.mark.parametrize("quality,luma", [(90, True), (50, False), (100, True)])
def test_pallas_matches_xla(quality, luma):
    rng = np.random.default_rng(0)
    blocks = (rng.integers(0, 256, (700, 64)).astype(np.int32) - 128)
    tab = quantization_table("default", quality, luma)

    got = np.asarray(fdct_quantize_pallas(jnp.asarray(blocks), tab))
    want = np.asarray(
        quantize_zigzag(
            fdct_blocks(jnp.asarray(blocks).reshape(-1, 8, 8)).reshape(-1, 64),
            tab,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_pipeline_end_to_end(monkeypatch):
    # The coefficient-builder cache keys on the resolved Pallas flag, so
    # toggling the env var alone switches paths.
    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "1")
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    from tpuenc import ColorType, Encoder

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    with_pallas = Encoder(85).encode(img, 40, 24, ColorType.RGB)

    monkeypatch.setenv("TPUENC_PALLAS_FDCT", "0")
    without = Encoder(85).encode(img, 40, 24, ColorType.RGB)
    assert with_pallas == without
