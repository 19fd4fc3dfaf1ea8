"""Frozen golden-byte fixtures: encoder output must be byte-identical.

The fixtures in ``tests/fixtures/`` were generated once (see
``fixtures/generate.py``), validated through the independent decoder and
Pillow, then frozen.  These tests pin the complete bitstream — segment
layout, tables, scan structure, entropy bytes — so any unintentional
semantic drift fails loudly even if every in-repo implementation drifts
together (the reference's raw-byte expectations: ``lib.rs:417-428``,
``lib.rs:467-505``).
"""

from __future__ import annotations

import os

import pytest

from tests.fixtures.generate import _img, build_cases

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

CASES = build_cases()


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_bytes(name, monkeypatch):
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "0")
    build, ct, ch, seed, w, h = CASES[name]
    want = open(os.path.join(HERE, f"{name}.jpg"), "rb").read()
    got = build().encode(_img(ch, seed, w, h).tobytes(), w, h, ct)
    assert got == want, f"bitstream drift in fixture {name}"


@pytest.mark.parametrize("name", [
    "baseline_q90_444",
    "restart2_q80_420",
    # Device-path progressive / odd-geometry parity also rides
    # test_pack_v2 + test_device_entropy in the fast tier; the frozen
    # fixture pins stay in the nightly tier.
    pytest.param("progressive4_q90", marks=pytest.mark.slow),
    pytest.param("ycck_prog4_rst2_q90", marks=pytest.mark.slow),
    pytest.param("geom258x172_rst4_q80_420", marks=pytest.mark.slow),
])
def test_golden_bytes_device_paths(name, monkeypatch):
    """Both device packers must reproduce the frozen bytes too."""
    monkeypatch.setenv("TPUENC_DEVICE_ENTROPY", "strict")
    build, ct, ch, seed, w, h = CASES[name]
    want = open(os.path.join(HERE, f"{name}.jpg"), "rb").read()
    for version in ("v1", "v2"):
        monkeypatch.setenv("TPUENC_PACK", version)
        got = build().encode(_img(ch, seed, w, h).tobytes(), w, h, ct)
        assert got == want, f"{name} drift on device pack {version}"


def test_fixture_markers():
    """Raw marker-level expectations, as the reference pins DRI bytes
    (lib.rs:417-428)."""
    data = open(os.path.join(HERE, "restart2_q80_420.jpg"), "rb").read()
    assert b"\xff\xdd\x00\x04\x00\x02" in data  # DRI, interval 2
    assert b"\xff\xd0" in data  # RST0 actually emitted
    prog = open(os.path.join(HERE, "progressive4_q90.jpg"), "rb").read()
    assert b"\xff\xc2" in prog  # SOF2
    base = open(os.path.join(HERE, "baseline_q90_444.jpg"), "rb").read()
    assert b"\xff\xc0" in base and b"\xff\xc2" not in base
