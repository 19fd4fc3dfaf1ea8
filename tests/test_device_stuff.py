"""Device-side realign + 0xFF stuffing + RST insertion must be
byte-identical to the host finish (native/py realign_segments) for every
mode: SURVEY §7 step 4 / VERDICT r3 #4.  Reference semantics:
writer.rs:138-145 (1-padding), 156-167 (stuffing), encoder.rs:748-757
(RST cycling)."""

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor


@pytest.mark.parametrize(
    "name,setup",
    [
        ("plain_q95", lambda e: None),
        ("restart", lambda e: e.set_restart_interval(4)),
        ("restart_420", lambda e: (
            e.set_sampling_factor(SamplingFactor.F_2_2),
            e.set_restart_interval(3),
        )),
        ("progressive_restart", lambda e: (
            e.set_progressive(True), e.set_restart_interval(5))),
        ("sequential_4x1",
         lambda e: e.set_sampling_factor(SamplingFactor.F_4_1)),
        ("optimized",
         lambda e: e.set_optimized_huffman_tables(True)),
    ],
)
def test_device_stuff_matches_host_finish(name, setup, monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setenv("TPUENC_PACK", "v2")
    rng = np.random.default_rng(31)
    w, h = 70, 62
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    enc = Encoder(95)
    setup(enc)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    assert enc.last_encode_path == "device-v2"

    monkeypatch.setenv("TPUENC_DEVICE_STUFF", "1")
    enc2 = Encoder(95)
    setup(enc2)
    got = enc2.encode(img.tobytes(), w, h, ColorType.RGB)
    assert got == want


def test_device_stuff_many_ff(monkeypatch):
    """Flat-ish high-quality content maximizes 0xFF-dense codes; the
    stuffed stream must still match the host finish."""
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setenv("TPUENC_PACK", "v2")
    w, h = 48, 48
    # Alternating extremes produce long runs of large coefficients.
    img = np.zeros((h, w, 3), np.uint8)
    img[::2] = 255
    img[:, ::2, 1] = 255

    enc = Encoder(100)
    enc.set_restart_interval(2)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)

    monkeypatch.setenv("TPUENC_DEVICE_STUFF", "1")
    enc2 = Encoder(100)
    enc2.set_restart_interval(2)
    got = enc2.encode(img.tobytes(), w, h, ColorType.RGB)
    assert got == want
