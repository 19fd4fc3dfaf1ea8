"""Cross-encoder parity vs libjpeg (Pillow / libjpeg-turbo).

The reference pins its arithmetic to C libjpeg: fdct golden vectors
captured from ``jpeg_fdct_islow`` (``/root/reference/src/fdct.rs:240-286``)
and color-conversion triples "taken from libjpeg"
(``image_buffer.rs:315-423``) — arithmetic tpuenc matches by the same
golden vectors.  With no Rust toolchain in this environment, the
strongest available external parity anchor is therefore libjpeg itself
(VERDICT r4 #3): encode the same pixels with tpuenc and Pillow at fixed
default tables (baseline 4:4:4, no restarts), strip headers, and compare.

Expected relationship (measured, see docs/PARITY.md "libjpeg
cross-encoder anchor"):

* whenever the two encoders' decoded quantized coefficients agree, the
  entropy-coded scan payloads are BYTE-IDENTICAL (same K.3 Huffman
  tables, same quality scaling, same RLE/EOB semantics);
* where they differ, every differing coefficient is within ±1 and the
  divergence is confined to a few % of high-frequency coefficients —
  libjpeg-turbo's SIMD quantization rounds differently from the C
  arithmetic the reference (and tpuenc) implements.

The DQT segments must always match exactly: both encoders implement
libjpeg's quality scaling (``quantization.rs:261-283``).
"""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.testing import decode_coefficients

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


# ---------------------------------------------------------------------------
# Minimal JFIF segment walker (independent of the encoder's own writers).
# ---------------------------------------------------------------------------

def split_segments(data: bytes):
    """[(marker_byte, payload bytes)] plus the entropy-coded scan data
    attached to each SOS payload (up to the next marker that is not RSTn
    or stuffed 0xFF00)."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    out = []
    i = 2
    n = len(data)
    while i < n:
        assert data[i] == 0xFF, hex(i)
        m = data[i + 1]
        i += 2
        if m in (0xD8, 0xD9):  # SOI/EOI
            out.append((m, b""))
            if m == 0xD9:
                break
            continue
        ln = int.from_bytes(data[i : i + 2], "big")
        payload = data[i + 2 : i + ln]
        i += ln
        if m == 0xDA:  # SOS: scan data follows
            j = i
            while j < n - 1:
                if data[j] == 0xFF and data[j + 1] != 0x00 and not (
                    0xD0 <= data[j + 1] <= 0xD7
                ):
                    break
                j += 1
            out.append((m, payload + b"\x00" + data[i:j]))
            i = j
        else:
            out.append((m, payload))
    return out


def segments_by_marker(data: bytes, marker: int):
    return [p for m, p in split_segments(data) if m == marker]


def dqt_tables(data: bytes):
    """{table_id: 64 zigzag bytes} across all DQT segments."""
    out = {}
    for p in segments_by_marker(data, 0xDB):
        i = 0
        while i < len(p):
            pq, tq = p[i] >> 4, p[i] & 15
            assert pq == 0  # 8-bit precision everywhere here
            out[tq] = p[i + 1 : i + 65]
            i += 65
    return out


def dht_tables(data: bytes):
    """{(class, id): bits+values payload} across all DHT segments."""
    out = {}
    for p in segments_by_marker(data, 0xC4):
        i = 0
        while i < len(p):
            tc, th = p[i] >> 4, p[i] & 15
            nvals = sum(p[i + 1 : i + 17])
            out[(tc, th)] = p[i + 1 : i + 17 + nvals]
            i += 17 + nvals
    return out


def scan_payloads(data: bytes):
    """Entropy payload of each scan (bytes after the SOS header)."""
    out = []
    for m, p in split_segments(data):
        if m == 0xDA:
            hdr_len = 1 + 2 * p[0] + 3  # Ns + (id, tabs)*Ns + Ss/Se/Ah/Al
            # p = header + b"\x00" + scan data (see split_segments)
            out.append(p[hdr_len + 1 :])
    return out


def pil_bytes(arr: np.ndarray, quality: int) -> bytes:
    mode = "L" if arr.ndim == 2 else "RGB"
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(
        buf, "JPEG", quality=quality, subsampling=0
    )
    return buf.getvalue()


def tpuenc_bytes(arr: np.ndarray, quality: int) -> bytes:
    h, w = arr.shape[:2]
    ct = ColorType.LUMA if arr.ndim == 2 else ColorType.RGB
    e = Encoder(quality)
    e.set_sampling_factor(SamplingFactor.F_1_1)
    return e.encode(arr, w, h, ct)


def coeff_grids(data: bytes):
    dec = decode_coefficients(data)
    return [
        c.coeffs[: c.ni_rows, : c.ni_cols].astype(np.int32)
        for c in dec.components
    ]


def _image(kind: str, w: int, h: int, channels: int) -> np.ndarray:
    """Deterministic test content: smooth gradient, photo-like low-pass
    noise, or hard noise."""
    rng = np.random.default_rng(hash((kind, w, h, channels)) & 0xFFFF)
    if kind == "gradient":
        x = np.linspace(0, 255, w)[None, :]
        y = np.linspace(0, 128, h)[:, None]
        base = (x + y) % 256
        img = np.stack(
            [(base + 40 * c) % 256 for c in range(max(channels, 1))], axis=-1
        )
    elif kind == "photo":
        img = rng.normal(128, 60, (h + 8, w + 8, max(channels, 1)))
        k = np.ones((5, 5)) / 25.0
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(img, (5, 5), axis=(0, 1))
        img = np.einsum("hwcij,ij->hwc", win[: h, : w], k)
    else:  # noise
        img = rng.integers(0, 256, (h, w, max(channels, 1)))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img[..., 0] if channels == 1 else img


CORPUS = [
    # (kind, w, h, channels, quality)
    ("gradient", 32, 32, 1, 90),
    ("gradient", 32, 32, 3, 90),
    ("gradient", 33, 17, 3, 90),   # partial trailing MCU both axes
    ("gradient", 16, 16, 3, 100),
    ("photo", 64, 48, 3, 50),
    ("photo", 80, 56, 1, 75),
    ("photo", 41, 23, 3, 95),
    ("noise", 40, 40, 3, 85),
    ("noise", 24, 24, 1, 100),
]


@pytest.fixture(autouse=True)
def _host_packer():
    """The comparison is about emitted bytes, not the packing backend;
    the host path avoids per-case interpret compiles in the fast tier
    (device/host byte identity is pinned by the rest of the suite)."""
    old = os.environ.get("TPUENC_DEVICE_ENTROPY")
    os.environ["TPUENC_DEVICE_ENTROPY"] = "0"
    yield
    if old is None:
        os.environ.pop("TPUENC_DEVICE_ENTROPY", None)
    else:
        os.environ["TPUENC_DEVICE_ENTROPY"] = old


@pytest.mark.parametrize(
    "kind,w,h,channels,quality",
    CORPUS,
    ids=[f"{k}{w}x{h}c{c}q{q}" for k, w, h, c, q in CORPUS],
)
def test_cross_encoder_parity(kind, w, h, channels, quality):
    img = _image(kind, w, h, channels)
    ours = tpuenc_bytes(img, quality)
    theirs = pil_bytes(img, quality)

    # Quantization tables must be identical: both sides implement
    # libjpeg's quality scaling.  (libjpeg emits only the tables its
    # scan uses — just the luma pair for grayscale — while tpuenc, like
    # the reference frame header encoder.rs:633-667, always writes
    # both; compare the tables libjpeg emitted.)
    ours_q, theirs_q = dqt_tables(ours), dqt_tables(theirs)
    for tid, tbl in theirs_q.items():
        assert ours_q[tid] == tbl, f"DQT {tid}"
    ours_h, theirs_h = dht_tables(ours), dht_tables(theirs)
    for key, tbl in theirs_h.items():
        assert ours_h[key] == tbl, f"DHT {key}"

    g_ours = coeff_grids(ours)
    g_theirs = coeff_grids(theirs)
    assert len(g_ours) == len(g_theirs)

    if all((a == b).all() for a, b in zip(g_ours, g_theirs)):
        # Identical quantized coefficients -> identical entropy coding.
        assert scan_payloads(ours) == scan_payloads(theirs)
    else:
        # libjpeg-turbo SIMD quantization rounding: divergence must be
        # within ±1 and confined to a small fraction of coefficients.
        total = 0
        diff = 0
        for a, b in zip(g_ours, g_theirs):
            d = np.abs(a - b)
            assert d.max() <= 1, d.max()
            total += d.size
            diff += int((d > 0).sum())
        assert diff / total <= 0.10, f"{diff}/{total}"


def test_cross_encoder_match_rate_summary():
    """The corpus-wide relationship documented in docs/PARITY.md
    (measured 7/9 byte-identical; the rest differ on <= 0.33% of
    coefficients, all within ±1 — libjpeg-turbo SIMD quantization
    rounding): at least two thirds of the corpus must stay
    byte-identical end to end."""
    identical = 0
    for kind, w, h, channels, quality in CORPUS:
        img = _image(kind, w, h, channels)
        ours = tpuenc_bytes(img, quality)
        theirs = pil_bytes(img, quality)
        if scan_payloads(ours) == scan_payloads(theirs):
            identical += 1
    assert identical >= (2 * len(CORPUS)) // 3, identical
