"""Full progressive scan domain (2-64 scans, reference encoder.rs:321-333).

The reference's band math (``encoder.rs:924-936``: ``values_per_scan =
64/(scans-1)``, ``start = max(1, k*vps)``) yields an EMPTY first band
``[1, 1)`` for every ``scans >= 34``; ``write_ac_block`` over an empty
range emits nothing — not even EOB (``writer.rs:364-384``) — and the
scan header carries Se < Ss (libjpeg therefore refuses such streams;
the in-repo T.81 decoder is the round-trip anchor here).  These tests
pin that domain end to end: band math, per-packer empty-band semantics,
coefficient round-trips, and device/host byte parity for plans beyond
the old 48-entry device gate (VERDICT r4 #1).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tpuenc import ColorType, Encoder
from tpuenc.core.tables import default_tables
from tpuenc.entropy.bitpack import encode_scan
from tpuenc.entropy.huffopt import progressive_bands
from tpuenc.entropy.symbols import ac_symbols
from tpuenc.testing import decode_coefficients


def _ref_bands(scans: int):
    """Band list straight from the reference arithmetic
    (encoder.rs:924-936)."""
    n = scans - 1
    vps = 64 // n
    out = []
    for k in range(n):
        start = max(1, k * vps)
        end = 64 if k == n - 1 else (k + 1) * vps
        out.append((start, end))
    return out


def test_progressive_bands_full_domain_matches_reference_math():
    for scans in range(2, 65):
        assert progressive_bands(scans) == _ref_bands(scans), scans


def test_empty_band_only_at_34_plus():
    for scans in range(2, 65):
        empties = [b for b in progressive_bands(scans) if b[0] >= b[1]]
        if scans >= 34:
            assert empties == [(1, 1)], scans
        else:
            assert empties == [], scans


def test_ac_symbols_empty_band():
    blocks = np.zeros((5, 64), np.int16)
    blocks[:, 1] = 7  # nonzero coefficients OUTSIDE the (empty) band
    sym = ac_symbols(blocks, 1, 1)
    assert sym["sym"].shape == (5, 0)
    assert not sym["eob"].any()  # no EOB for an empty range


def test_oracle_and_native_empty_band_emit_nothing():
    from tpuenc.entropy import native as native_entropy

    (ldc, lac), _ = default_tables()
    rng = np.random.default_rng(8)
    blocks = rng.integers(-50, 50, (12, 64)).astype(np.int16)
    got = encode_scan(
        blocks, None, [None], [lac],
        emit_dc=False, spectral_start=1, spectral_end=1,
    )
    assert got == b""
    nat = native_entropy.encode_scan(
        blocks, None, [None], [lac],
        emit_dc=False, spectral_start=1, spectral_end=1,
    )
    if nat is not None:  # native library built
        assert nat == b""


@pytest.mark.parametrize("scans", [34, 64])
def test_high_scan_host_roundtrip_gray(scans):
    """scans >= 34 (one empty band) decodes to exact coefficients via the
    independent in-repo T.81 decoder (host packer path)."""
    os.environ["TPUENC_DEVICE_ENTROPY"] = "0"
    try:
        img = np.random.default_rng(scans).integers(
            0, 256, (40, 40), np.uint8
        )
        e = Encoder(85)
        e.set_progressive_scans(scans)
        out = e.encode(img, 40, 40, ColorType.LUMA)
        dec = decode_coefficients(out)
        assert (dec.width, dec.height) == (40, 40)

        from tpuenc.kernels.pipeline import coefficients_fn

        fn, layout = coefficients_fn(40, 40, ColorType.LUMA, e._config())
        want = np.asarray(fn(img)[0]).reshape(5, 5, 64)
        comp = dec.components[0]
        got = comp.coeffs[: comp.ni_rows, : comp.ni_cols]
        np.testing.assert_array_equal(got, want.astype(np.int32))
    finally:
        os.environ.pop("TPUENC_DEVICE_ENTROPY", None)


def test_plan_pack_rows():
    from tpuenc.api import _plan_pack_rows
    from tpuenc.core.types import EncoderConfig, SamplingFactor

    # Interleaved 4:4:4 RGB: 3 blocks per MCU.
    cfg = EncoderConfig(quality=90, sampling_factor=SamplingFactor.F_1_1)
    assert _plan_pack_rows(64, 64, ColorType.RGB, cfg) == 8 * 8 * 3
    # 64-scan progressive RGB 4:4:4: every scan of the plan contributes
    # one row per block of its component (1 DC + 63 AC bands per comp).
    cfg = EncoderConfig(
        quality=90, sampling_factor=SamplingFactor.F_1_1,
        progressive_scans=64,
    )
    assert _plan_pack_rows(64, 64, ColorType.RGB, cfg) == 8 * 8 * 3 * 64
    # Sequential: one scan per component.
    cfg = EncoderConfig(
        quality=90, sampling_factor=SamplingFactor.F_4_1,
        optimize_huffman_table=True,
    )
    rows = _plan_pack_rows(64, 64, ColorType.RGB, cfg)
    assert rows == 8 * 8 + 2 * 8 * 2  # Y 8x8 + two chroma 2x8 grids


@pytest.mark.slow
@pytest.mark.parametrize("pack", ["v1", "v2"])
def test_device_high_scan_parity_gray64(pack):
    """64-scan grayscale (64-entry plan, beyond the old 48 gate) packs on
    the device path byte-identically to the host packer."""
    img = np.random.default_rng(4).integers(0, 256, (40, 40), np.uint8)

    def run(mode):
        os.environ["TPUENC_DEVICE_ENTROPY"] = mode
        e = Encoder(85)
        e.set_progressive_scans(64)
        out = e.encode(img, 40, 40, ColorType.LUMA)
        return out, e.last_encode_path

    try:
        host, _ = run("0")
        os.environ["TPUENC_PACK"] = pack
        dev, path = run("strict")
        assert path == f"device-{pack}"
        assert dev == host
    finally:
        os.environ.pop("TPUENC_DEVICE_ENTROPY", None)
        os.environ.pop("TPUENC_PACK", None)


@pytest.mark.slow
def test_device_high_scan_parity_rgb17():
    """17-scan RGB (51-entry plan) rides the fused device path."""
    img = np.random.default_rng(3).integers(0, 256, (48, 56, 3), np.uint8)

    def run(mode):
        os.environ["TPUENC_DEVICE_ENTROPY"] = mode
        e = Encoder(85)
        e.set_progressive_scans(17)
        out = e.encode(img, 56, 48, ColorType.RGB)
        return out, e.last_encode_path

    try:
        host, _ = run("0")
        dev, path = run("strict")
        assert path.startswith("device-")
        assert dev == host
    finally:
        os.environ.pop("TPUENC_DEVICE_ENTROPY", None)
