"""Bounded-memory chunked encode must be byte-identical to the one-shot
paths: the MCU-row chunk stream (mid-stream DC chains, global restart
geometry, host bit-concatenation) reproduces the exact scan payload."""

import numpy as np
import pytest

from tpuenc import ColorType, Encoder, SamplingFactor
from tpuenc.entropy.chunked import append_bits, encode_interleaved_chunked


def _scan_payload(jpeg: bytes) -> bytes:
    """Entropy payload of a single-scan file: after the SOS header, before
    EOI."""
    i = jpeg.find(b"\xff\xda")
    assert i >= 0
    seg_len = (jpeg[i + 2] << 8) | jpeg[i + 3]
    start = i + 2 + seg_len
    assert jpeg[-2:] == b"\xff\xd9"
    return jpeg[start:-2]


def test_append_bits_random():
    rng = np.random.default_rng(0)
    ref_bits = []
    dst = bytearray()
    bits = 0
    for _ in range(40):
        n = int(rng.integers(1, 77))
        chunk = rng.integers(0, 2, n).tolist()
        ref_bits += chunk
        by = np.zeros((n + 7) // 8, np.uint8)
        for j, b in enumerate(chunk):
            by[j >> 3] |= b << (7 - (j & 7))
        bits = append_bits(dst, bits, by, n)
    assert bits == len(ref_bits)
    got = []
    for j in range(bits):
        got.append((dst[j >> 3] >> (7 - (j & 7))) & 1)
    assert got == ref_bits


@pytest.mark.parametrize(
    "name,setup",
    [
        ("plain", lambda e: None),
        ("restart_unaligned", lambda e: e.set_restart_interval(5)),
        ("restart_420", lambda e: (
            e.set_sampling_factor(SamplingFactor.F_2_2),
            e.set_restart_interval(3),
        )),
    ],
)
def test_chunked_matches_single(name, setup, monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")  # host oracle reference
    rng = np.random.default_rng(11)
    w, h = 70, 150  # many MCU rows; partial trailing MCU in both dims
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    enc = Encoder(85)
    setup(enc)
    whole = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    want = _scan_payload(whole)

    config = enc._config()
    from tpuenc.core.tables import default_tables

    huffman = [list(p) for p in default_tables()]
    # Tiny chunks (2 MCU rows) force many mid-stream chunk boundaries that
    # do not coincide with restart segments.
    got = encode_interleaved_chunked(
        img, w, h, ColorType.RGB, config, huffman, chunk_mcu_rows=2
    )
    assert got == want


def test_chunked_product_path(monkeypatch):
    """Above DEVICE_BLOCK_LIMIT, interleaved encode() streams through the
    chunked device path and stays byte-identical to the host oracle."""
    import tpuenc.api as api

    rng = np.random.default_rng(9)
    w, h = 64, 120
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc = Encoder(85)
    enc.set_restart_interval(7)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    assert enc.last_encode_path == "host"

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setattr(api, "DEVICE_BLOCK_LIMIT", 10)  # force chunking
    enc2 = Encoder(85)
    enc2.set_restart_interval(7)
    got = enc2.encode(img.tobytes(), w, h, ColorType.RGB)
    assert got == want
    assert enc2.last_encode_path == "device-chunked"


def test_chunked_luma_and_cmyk(monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    rng = np.random.default_rng(3)
    from tpuenc.core.tables import default_tables

    w, h = 40, 90
    gray = rng.integers(0, 256, (h, w), np.uint8)
    enc = Encoder(90)
    want = _scan_payload(enc.encode(gray.tobytes(), w, h, ColorType.LUMA))
    got = encode_interleaved_chunked(
        gray, w, h, ColorType.LUMA, enc._config(),
        [list(p) for p in default_tables()], chunk_mcu_rows=3,
    )
    assert got == want

    cmyk = rng.integers(0, 256, (h, w, 4), np.uint8)
    enc = Encoder(90)
    want = _scan_payload(enc.encode(cmyk.tobytes(), w, h, ColorType.CMYK))
    got = encode_interleaved_chunked(
        cmyk, w, h, ColorType.CMYK, enc._config(),
        [list(p) for p in default_tables()], chunk_mcu_rows=4,
    )
    assert got == want


@pytest.mark.parametrize(
    "name,setup",
    [
        ("no_restart", lambda e: None),          # single segment: mid-
                                                 # segment byte flushing
        ("restart", lambda e: e.set_restart_interval(4)),
        ("restart_420", lambda e: (
            e.set_sampling_factor(SamplingFactor.F_2_2),
            e.set_restart_interval(3),
        )),
    ],
)
def test_encode_stream_matches_encode(name, setup, monkeypatch):
    """encode_stream pieces concatenate to exactly encode()'s bytes and
    are yielded incrementally (several data pieces before the end)."""
    rng = np.random.default_rng(21)
    w, h = 70, 150
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc = Encoder(85)
    setup(enc)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    enc2 = Encoder(85)
    setup(enc2)
    pieces = list(
        enc2.encode_stream(img.tobytes(), w, h, ColorType.RGB,
                           chunk_mcu_rows=2)
    )
    assert b"".join(pieces) == want
    # prefix + >=3 incremental scan pieces + EOI
    assert len(pieces) >= 5, len(pieces)
    assert pieces[-1] == b"\xff\xd9"
    assert enc2.last_encode_path == "device-chunked-stream"


def test_encode_stream_multiscan_fallback(monkeypatch):
    """Progressive (multi-pass) streams per scan — one piece per SOS +
    payload, then EOI — and the concatenation matches encode()
    (reference writes each scan to the sink as produced,
    encoder.rs:869-975)."""
    rng = np.random.default_rng(5)
    w, h = 40, 40
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    enc = Encoder(80)
    enc.set_progressive(True)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    enc2 = Encoder(80)
    enc2.set_progressive(True)
    pieces = list(enc2.encode_stream(img.tobytes(), w, h, ColorType.RGB))
    assert b"".join(pieces) == want
    if enc2.last_encode_path.startswith("device"):
        # 4-scan progressive: 3 DC + 3*3 AC band scans + EOI.
        assert len(pieces) == 13
        assert pieces[-1] == b"\xff\xd9"
        # every piece after the first starts with an SOS marker
        for p in pieces[1:-1]:
            assert p[:2] == b"\xff\xda"

    # Host-only path still yields a single body piece, identical bytes.
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc3 = Encoder(80)
    enc3.set_progressive(True)
    got3 = b"".join(enc3.encode_stream(img.tobytes(), w, h, ColorType.RGB))
    assert got3 == want


def test_encode_stream_optimized_per_scan(monkeypatch):
    """Optimized tables (two-pass) also stream per scan with identical
    bytes; the frame header carries the optimized DHT."""
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    rng = np.random.default_rng(6)
    w, h = 38, 26
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    enc = Encoder(92)
    enc.set_optimized_huffman_tables(True)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    enc2 = Encoder(92)
    enc2.set_optimized_huffman_tables(True)
    pieces = list(enc2.encode_stream(img.tobytes(), w, h, ColorType.RGB))
    assert b"".join(pieces) == want
    assert len(pieces) == 4  # 3 sequential scans + EOI


def test_encode_stream_row_source(monkeypatch):
    """Pull-model input: rows are generated on demand per MCU-row band,
    never holding more than one band — byte-identical to encode() of the
    same image (VERDICT #3 / reference image_buffer.rs:86-98)."""
    w, h = 70, 150
    requests = []

    def row(y):
        # Deterministic synthetic scanline generator: no full image exists.
        x = np.arange(w, dtype=np.uint32)
        r = (3 * y + x) % 256
        g = (7 * y ^ x) % 256
        b = (y * y + 5 * x) % 256
        return np.stack([r, g, b], axis=-1).astype(np.uint8)

    def get_rows(y0, n):
        requests.append((y0, n))
        return np.stack([row(y) for y in range(y0, y0 + n)])

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    full = np.stack([row(y) for y in range(h)])
    enc = Encoder(85)
    enc.set_restart_interval(4)
    want = enc.encode(full.tobytes(), w, h, ColorType.RGB)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    enc2 = Encoder(85)
    enc2.set_restart_interval(4)
    got = b"".join(
        enc2.encode_stream(get_rows, w, h, ColorType.RGB, chunk_mcu_rows=2)
    )
    assert got == want
    # O(band) pulls: 2 MCU rows * 16 px (4:2:0), never the whole image.
    assert len(requests) >= 4
    assert max(n for _, n in requests) <= 32
    assert sum(n for _, n in requests) == h
    assert enc2.last_encode_path == "device-chunked-stream"


def test_encode_stream_row_source_object_and_multiscan(monkeypatch):
    """An object with get_rows works too; multi-pass modes drain the
    source once and still match encode()."""
    rng = np.random.default_rng(11)
    w, h = 40, 40
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    class Source:
        def get_rows(self, y0, n):
            return img[y0:y0 + n]

    enc = Encoder(80)
    enc.set_progressive(True)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    enc2 = Encoder(80)
    enc2.set_progressive(True)
    got = b"".join(enc2.encode_stream(Source(), w, h, ColorType.RGB))
    assert got == want

    # Interleaved path with the object form, bytes return type.
    enc3 = Encoder(80)
    want3 = enc3.encode(img.tobytes(), w, h, ColorType.RGB)

    class ByteSource:
        def get_rows(self, y0, n):
            return img[y0:y0 + n].tobytes()

    enc4 = Encoder(80)
    got3 = b"".join(enc4.encode_stream(ByteSource(), w, h, ColorType.RGB))
    assert got3 == want3


def test_device_resident_row_source():
    """A row source returning jax arrays (pixels already in HBM) must
    produce bytes identical to the host-array path — no host round trip
    for the input (chunked.fetch_rows jax.Array branch)."""
    import jax

    from tpuenc.api import Encoder
    from tpuenc.core.types import ColorType

    rng = np.random.default_rng(5)
    w, h = 96, 88  # non-multiple of 16: exercises device-side edge pad
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    dimg = jax.device_put(img)

    enc = Encoder(88)
    enc.set_restart_interval(2)
    ref = b"".join(enc.encode_stream(img, w, h, ColorType.RGB,
                                     chunk_mcu_rows=3))

    enc2 = Encoder(88)
    enc2.set_restart_interval(2)
    dev = b"".join(enc2.encode_stream(
        lambda y0, n: dimg[y0:y0 + n], w, h, ColorType.RGB,
        chunk_mcu_rows=3,
    ))
    assert dev == ref


# ---------------------------------------------------------------------------
# Bounded-memory multi-pass path (sequential / progressive / optimized):
# above DEVICE_BLOCK_LIMIT these modes stream coefficients into the HBM
# store and pack every scan in chunks — byte-identical to the host oracle
# (reference parity: encoder.rs:810-864, 869-975 encode any size in every
# mode).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,setup",
    [
        ("sequential_4x1",
         lambda e: e.set_sampling_factor(SamplingFactor.F_4_1)),
        ("progressive", lambda e: e.set_progressive(True)),
        pytest.param(
            "progressive_restart",
            lambda e: (e.set_progressive(6), e.set_restart_interval(3)),
            marks=pytest.mark.slow,
        ),
        ("optimized",
         lambda e: e.set_optimized_huffman_tables(True)),
        ("optimized_progressive", lambda e: (
            e.set_optimized_huffman_tables(True), e.set_progressive(True))),
    ],
)
def test_multipass_chunked_product_path(name, setup, monkeypatch):
    """encode() above DEVICE_BLOCK_LIMIT in multi-pass modes goes through
    the chunked multipass device path, byte-identical to the host path."""
    import tpuenc.api as api

    rng = np.random.default_rng(17)
    w, h = 70, 150  # partial trailing MCU both dims
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc = Encoder(85)
    setup(enc)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)
    assert enc.last_encode_path == "host"

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setattr(api, "DEVICE_BLOCK_LIMIT", 10)
    enc2 = Encoder(85)
    setup(enc2)
    got = enc2.encode(img.tobytes(), w, h, ColorType.RGB)
    assert enc2.last_encode_path == "device-chunked-multipass"
    assert got == want


@pytest.mark.slow
def test_multipass_chunked_small_chunks(monkeypatch):
    """Direct per-scan payload equality with chunk boundaries forced both
    in the coefficient phase (2 MCU rows) and the pack phase (128-block
    pack chunks crossing restart segments mid-chunk)."""
    from tpuenc.core.tables import default_tables
    from tpuenc.entropy import device_encode as de
    from tpuenc.entropy.chunked_multipass import encode_multipass_chunked

    rng = np.random.default_rng(23)
    w, h = 70, 150
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    enc = Encoder(85)
    enc.set_progressive(4)
    enc.set_restart_interval(5)
    config = enc._config()

    huffman = [list(p) for p in default_tables()]
    want = de.device_encode_scans(
        img, w, h, ColorType.RGB, config, huffman
    )
    assert want is not None

    huffman2 = [list(p) for p in default_tables()]
    got = encode_multipass_chunked(
        img, w, h, ColorType.RGB, config, huffman2,
        chunk_mcu_rows=2, pack_chunk=128,
    )
    assert got is not None
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"scan {i} differs"


def test_multipass_chunked_stream_and_ycck(monkeypatch):
    """encode_stream for a big-image multi-pass config rides the chunked
    multipass path per scan; YCCK (4-component) covered."""
    import tpuenc.api as api

    rng = np.random.default_rng(29)
    w, h = 64, 80
    img = rng.integers(0, 256, (h, w, 4), np.uint8)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc = Encoder(90)
    enc.set_optimized_huffman_tables(True)
    want = enc.encode(img.tobytes(), w, h, ColorType.YCCK)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setattr(api, "DEVICE_BLOCK_LIMIT", 10)
    enc2 = Encoder(90)
    enc2.set_optimized_huffman_tables(True)
    pieces = list(enc2.encode_stream(img.tobytes(), w, h, ColorType.YCCK))
    assert enc2.last_encode_path == "device-chunked-multipass"
    assert b"".join(pieces) == want


def test_multipass_chunked_optimized_multichunk(monkeypatch):
    """Regression (round-4 review): optimized-Huffman histograms are
    accumulated per coefficient chunk; each chunk's first block must be
    re-binned against the previous chunk's DC (the reference runs ONE
    unbroken diff chain per component, encoder.rs:1100-1117) or the K.2
    tables — and therefore every byte after the DHT — drift."""
    import tpuenc.api as api
    from tpuenc.entropy import chunked_multipass as cmp_mod

    rng = np.random.default_rng(37)
    w, h = 48, 170  # 11 MCU rows at 2x2 -> 6 coefficient chunks
    img = rng.integers(0, 256, (h, w, 3), np.uint8)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    enc = Encoder(85)
    enc.set_optimized_huffman_tables(True)
    want = enc.encode(img.tobytes(), w, h, ColorType.RGB)

    orig = cmp_mod.encode_multipass_chunked

    def forced(*args, **kw):
        kw["chunk_mcu_rows"] = 2
        return orig(*args, **kw)

    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    monkeypatch.setattr(api, "DEVICE_BLOCK_LIMIT", 10)
    monkeypatch.setattr(
        cmp_mod, "encode_multipass_chunked", forced
    )
    enc2 = Encoder(85)
    enc2.set_optimized_huffman_tables(True)
    got = enc2.encode(img.tobytes(), w, h, ColorType.RGB)
    assert enc2.last_encode_path == "device-chunked-multipass"
    assert got == want
