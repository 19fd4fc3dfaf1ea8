"""Encode -> independent-decode coefficient round-trip.

The decoder (``tpuenc.testing.decoder``) shares no code with any of the
three entropy packers, so exact coefficient equality here proves the
emitted bitstream semantics (Huffman codes, RLE, DC prediction, restart
handling, scan structure) against the T.81 decode rules — the role the
independent ``jpeg-decoder`` crate plays in the reference's suite
(``lib.rs:71-554``).
"""

from __future__ import annotations

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.core.types import EncoderConfig
from tpuenc.kernels.pipeline import coefficients_fn, scan_layout
from tpuenc.testing import decode_coefficients


def _expected_grids(img_arr, w, h, color_type, config):
    """Per-component (rows, cols, 64) zigzag coefficient grids from the
    encoder's own coefficient stage (the entropy stage's input)."""
    fn, layout = coefficients_fn(w, h, color_type, config)
    streams = [np.asarray(s) for s in fn(img_arr)]
    comps = layout["components"]
    grids = []
    if layout["interleaved"]:
        (stream,) = streams
        per_mcu = sum(
            c.vertical_sampling_factor * c.horizontal_sampling_factor
            for c in comps
        )
        mcu = stream.reshape(-1, per_mcu, 64)
        num_rows = mcu.shape[0] // (layout_cols(layout, w))
        num_cols = layout_cols(layout, w)
        off = 0
        for c in comps:
            cv, ch = c.vertical_sampling_factor, c.horizontal_sampling_factor
            part = mcu[:, off : off + cv * ch, :]
            off += cv * ch
            part = part.reshape(num_rows, num_cols, cv, ch, 64)
            part = np.moveaxis(part, 1, 2)  # (rows, cv, cols, ch, 64)
            grids.append(part.reshape(num_rows * cv, num_cols * ch, 64))
    else:
        max_h, max_v = layout["max_h"], layout["max_v"]

        def cdiv(a, b):
            return -(-a // b)

        for c, s in zip(comps, streams):
            h_scale = max_h // c.horizontal_sampling_factor
            v_scale = max_v // c.vertical_sampling_factor
            cols = cdiv(cdiv(w, 8), h_scale)
            rows = cdiv(cdiv(h, 8), v_scale)
            grids.append(s.reshape(rows, cols, 64))
    return grids, layout


def layout_cols(layout, w):
    return -(-w // (8 * layout["max_h"]))


def _roundtrip(img_arr, w, h, color_type, build):
    enc = build()
    out = enc.encode(img_arr.tobytes(), w, h, color_type)
    dec = decode_coefficients(out)
    assert (dec.width, dec.height) == (w, h)

    config = enc._config()
    grids, layout = _expected_grids(img_arr, w, h, color_type, config)
    assert len(dec.components) == len(grids)
    for comp, want in zip(dec.components, grids):
        if layout["interleaved"]:
            got = comp.coeffs
        else:
            got = comp.coeffs[: comp.ni_rows, : comp.ni_cols]
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_array_equal(got, want.astype(np.int32))
    return dec


def _rng_img(w, h, ch, seed=0):
    rng = np.random.default_rng(seed)
    if ch == 1:
        return rng.integers(0, 256, (h, w), np.uint8)
    return rng.integers(0, 256, (h, w, ch), np.uint8)


# 70x46: partial trailing MCU in both dimensions for 2x2 sampling.
W, H = 70, 46


def test_baseline_444():
    dec = _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB,
                     lambda: Encoder(90))
    assert not dec.progressive
    assert dec.num_scans == 1


def test_baseline_420_restart():
    def build():
        e = Encoder(80)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        e.set_restart_interval(3)
        return e

    dec = _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)
    assert dec.restart_interval == 3


def test_sequential_factor4():
    def build():
        e = Encoder(85)
        e.set_sampling_factor(SamplingFactor.F_4_1)
        return e

    dec = _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)
    assert dec.num_scans == 3  # one per component


def test_progressive():
    def build():
        e = Encoder(90)
        e.set_progressive_scans(4)
        return e

    dec = _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)
    assert dec.progressive
    # 3 DC scans + 3 bands x 3 components.
    assert dec.num_scans == 3 + 3 * 3


def test_progressive_subsampled_restart():
    def build():
        e = Encoder(75)
        e.set_sampling_factor(SamplingFactor.F_2_1)
        e.set_progressive_scans(5)
        e.set_restart_interval(4)
        return e

    _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)


def test_optimized_huffman():
    def build():
        e = Encoder(95)
        e.set_optimized_huffman_tables(True)
        return e

    _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)


def test_optimized_progressive():
    def build():
        e = Encoder(90)
        e.set_progressive_scans(3)
        e.set_optimized_huffman_tables(True)
        e.set_restart_interval(5)
        return e

    _roundtrip(_rng_img(W, H, 3), W, H, ColorType.RGB, build)


def test_luma():
    _roundtrip(_rng_img(33, 17, 1), 33, 17, ColorType.LUMA,
               lambda: Encoder(85))


def test_cmyk_and_ycck():
    _roundtrip(_rng_img(W, H, 4, seed=2), W, H, ColorType.CMYK,
               lambda: Encoder(85))

    def build():
        e = Encoder(85)
        e.set_sampling_factor(SamplingFactor.F_2_2)
        return e

    dec = _roundtrip(_rng_img(W, H, 4, seed=3), W, H,
                     ColorType.CMYK_AS_YCCK, build)
    assert len(dec.components) == 4


def test_quant_tables_decoded():
    img = _rng_img(24, 16, 3)
    out = Encoder(90).encode(img.tobytes(), 24, 16, ColorType.RGB)
    dec = decode_coefficients(out)
    from tpuenc.core.tables import quantization_table
    from tpuenc.core.tables import ZIGZAG

    # DQT holds the quality-scaled values in zigzag order, without the
    # engine's x8 DCT premultiply (quantization.rs:279-280).
    for tid, luma in ((0, True), (1, False)):
        qt = quantization_table("default", 90, luma=luma)
        want = (np.asarray(qt.values) // 8)[list(ZIGZAG)]
        np.testing.assert_array_equal(dec.quant_tables[tid], want)


def test_device_path_roundtrip(monkeypatch):
    """The v1/v2 device packers' bytes decode to the same coefficients."""
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    for version in ("v1", "v2"):
        monkeypatch.setenv("TPUENC_PACK", version)

        def build():
            e = Encoder(80)
            e.set_sampling_factor(SamplingFactor.F_2_2)
            e.set_restart_interval(4)
            return e

        _roundtrip(_rng_img(W, H, 3, seed=7), W, H, ColorType.RGB, build)
