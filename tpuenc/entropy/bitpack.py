"""Reference (oracle) entropy packer in pure Python/numpy.

Byte-exact re-implementation of the reference's bitstream layer
(``/root/reference/src/writer.rs:108-202`` bit buffer + stuffing;
``writer.rs:308-388`` per-block entropy emit) used as:

* the correctness oracle that the native C++ packer and the device entropy
  path are diffed against in tests, and
* the fallback when the native library is unavailable.

Semantics pinned here:

* MSB-first bit packing; every 0xFF byte is followed by a stuffed 0x00
  (writer.rs:156-167).
* ``finalize`` pads the tail with 1-bits to a byte boundary
  (writer.rs:138-145 writes 7 one-bits then flushes whole bytes).
* Restart markers RST(m), m cycling 0..7, between byte-aligned segments;
  DC predictors reset at segment starts (encoder.rs:723-757).
* Scans: full baseline (DC+AC), DC-only and AC band scans for progressive
  spectral selection (encoder.rs:869-975).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.tables import HuffmanTable
from .symbols import ac_symbols, get_code


class BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write_bits(self, value: int, size: int) -> None:
        if size == 0:
            return
        self._acc = (self._acc << size) | (value & ((1 << size) - 1))
        self._nbits += size
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def finalize(self) -> None:
        """Pad to byte boundary with 1-bits (reference writer.rs:138-145)."""
        if self._nbits > 0:
            pad = 8 - self._nbits
            self.write_bits((1 << pad) - 1, pad)
        self._acc = 0
        self._nbits = 0

    def write_marker(self, code: int) -> None:
        assert self._nbits == 0
        self._out += bytes((0xFF, code))

    def getvalue(self) -> bytes:
        return bytes(self._out)


def _huff(table: HuffmanTable, symbol: int):
    size = int(table.sizes[symbol])
    code = int(table.codes[symbol])
    assert size > 0, f"zero-size code for symbol {symbol}"
    return size, code


def encode_scan(
    blocks: np.ndarray,
    comp_ids: Optional[np.ndarray],
    dc_tables: Sequence[Optional[HuffmanTable]],
    ac_tables: Sequence[Optional[HuffmanTable]],
    restart_interval_blocks: int = 0,
    spectral_start: int = 1,
    spectral_end: int = 64,
    emit_dc: bool = True,
    emit_ac: bool = True,
) -> bytes:
    """Encode one scan's entropy-coded data (between SOS and the next marker).

    ``blocks``: (B, 64) int16 zigzag quantized coefficients in scan order.
    ``comp_ids``: (B,) per-block component index for table selection and DC
    prediction (None = all component 0).  ``restart_interval_blocks`` is the
    restart interval converted to blocks (interval * blocks_per_MCU for
    interleaved scans; the interval itself otherwise); 0 disables restarts.
    """
    B = blocks.shape[0]
    if comp_ids is None:
        comp_ids = np.zeros(B, dtype=np.int32)

    w = BitWriter()
    prev_dc = [0, 0, 0, 0]

    if emit_ac:
        sym = ac_symbols(blocks, spectral_start, spectral_end)

    seg = restart_interval_blocks if restart_interval_blocks > 0 else B
    n_restarts = 0
    for b in range(B):
        if b > 0 and b % seg == 0:
            w.finalize()
            w.write_marker(0xD0 + (n_restarts & 7))
            n_restarts += 1
            prev_dc = [0, 0, 0, 0]

        ci = int(comp_ids[b])

        if emit_dc:
            dc = int(blocks[b, 0])
            diff = dc - prev_dc[ci]
            size, extra = get_code(np.array([diff], dtype=np.int32))
            size, extra = int(size[0]), int(extra[0])
            hsize, hcode = _huff(dc_tables[ci], size)
            w.write_bits((hcode << size) | extra, hsize + size)
            prev_dc[ci] = dc

        if emit_ac:
            tab = ac_tables[ci]
            nz_idx = np.nonzero(sym["nz"][b])[0]
            for i in nz_idx:
                for _ in range(int(sym["zrl"][b, i])):
                    zs, zc = _huff(tab, 0xF0)
                    w.write_bits(zc, zs)
                s = int(sym["sym"][b, i])
                hsize, hcode = _huff(tab, s)
                size = int(sym["size"][b, i])
                extra = int(sym["extra"][b, i])
                w.write_bits((hcode << size) | extra, hsize + size)
            if bool(sym["eob"][b]):
                es, ec = _huff(tab, 0x00)
                w.write_bits(ec, es)

    w.finalize()
    return w.getvalue()
