"""Independent baseline+progressive JPEG decoder (to quantized coefficients).

This is the in-repo analog of the reference's use of the *independent*
``jpeg-decoder`` crate in its integration suite
(``/root/reference/Cargo.toml:24-25``, ``lib.rs:71-554``): a decoder that
shares **no code** with the encoder's entropy path, so encode→decode
coefficient equality actually proves the emitted bitstream, scan
structure, DC prediction, restart handling and Huffman coding — rather
than two sibling implementations agreeing on a common mistake.

Scope: everything the tpuenc/reference encoder can emit —

* SOF0 (baseline) and SOF2 (progressive, spectral selection only; the
  encoder always writes successive-approximation 0, ``writer.rs:449``)
* interleaved and non-interleaved scans, restart intervals, 1-4
  components, 8-bit DQT, multiple DHT/DQT segments, APPn/COM skip
* EOB-run semantics for progressive AC bands (general 2^r runs, though
  the encoder only ever emits EOB itself)

Decoding stops at quantized coefficients in **zigzag order** — exactly
what the encoder's coefficient stage produces — so round-trip tests can
assert bit-exact integer equality with no IDCT/dequant noise.

Pure Python + numpy; deliberately simple and slow (test-scale images).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


class JpegDecodeError(Exception):
    """Malformed or unsupported JPEG input."""


# ---------------------------------------------------------------------------
# Huffman tables (decode side)
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decoder built from the DHT (BITS, HUFFVAL) spec
    (ITU T.81 Annex C figures C.1-C.2, decode per F.2.2.3)."""

    def __init__(self, bits: List[int], values: List[int]):
        if len(bits) != 16 or sum(bits) != len(values):
            raise JpegDecodeError("bad DHT table")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1] == 0:
                self.maxcode[length] = -1
            else:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise JpegDecodeError("invalid Huffman code")
            code = (code << 1) | reader.read_bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


# ---------------------------------------------------------------------------
# Entropy-coded segment bit reader (with 0xFF00 unstuffing)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # next byte index
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegDecodeError("entropy data ran out")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # Marker inside entropy data where bits were expected.
                    raise JpegDecodeError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data"
                    )
            else:
                self.pos += 1
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self) -> Optional[int]:
        """If the (byte-aligned) stream position sits at a marker, return
        its second byte without consuming it."""
        if self.nbits:
            return None
        p = self.pos
        if p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] != 0x00:
            return self.data[p + 1]
        return None

    def consume_marker(self) -> int:
        m = self.at_marker()
        if m is None:
            raise JpegDecodeError("expected marker")
        self.pos += 2
        return m


def _extend(v: int, size: int) -> int:
    """Sign extension per T.81 F.2.2.1 (EXTEND)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# ---------------------------------------------------------------------------
# Decoded structures
# ---------------------------------------------------------------------------


@dataclass
class DecodedComponent:
    id: int
    h: int
    v: int
    tq: int                       # quantization table id
    coeffs: np.ndarray = None     # (rows, cols, 64) int32, zigzag order
    rows: int = 0                 # MCU-aligned grid
    cols: int = 0
    ni_rows: int = 0              # non-interleaved grid (subset)
    ni_cols: int = 0
    dc_tab: int = 0               # last-seen table bindings (per scan)
    ac_tab: int = 0


@dataclass
class DecodedImage:
    width: int
    height: int
    progressive: bool
    components: List[DecodedComponent]
    quant_tables: Dict[int, np.ndarray]      # id -> (64,) zigzag
    restart_interval: int = 0
    num_scans: int = 0
    app_segments: List[Tuple[int, bytes]] = field(default_factory=list)
    comment: Optional[bytes] = None

    def component(self, idx: int) -> DecodedComponent:
        return self.components[idx]


# ---------------------------------------------------------------------------
# The decoder
# ---------------------------------------------------------------------------


def _u16(data: bytes, i: int) -> int:
    return (data[i] << 8) | data[i + 1]


def decode_coefficients(data: bytes) -> DecodedImage:
    """Parse a JFIF file and entropy-decode every scan; returns quantized
    coefficients in zigzag order per component plus stream metadata."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegDecodeError("missing SOI")
    pos = 2

    dc_tables: Dict[int, _HuffDecoder] = {}
    ac_tables: Dict[int, _HuffDecoder] = {}
    quant_tables: Dict[int, np.ndarray] = {}
    img: Optional[DecodedImage] = None
    restart_interval = 0
    app_segments: List[Tuple[int, bytes]] = []
    comment: Optional[bytes] = None
    max_h = max_v = 1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegDecodeError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        seg_len = _u16(data, pos)
        body = data[pos + 2 : pos + seg_len]
        seg_end = pos + seg_len

        if 0xE0 <= marker <= 0xEF:  # APPn
            app_segments.append((marker & 0x0F, bytes(body)))
            pos = seg_end
        elif marker == 0xFE:  # COM
            comment = bytes(body)
            pos = seg_end
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if pq:
                    vals = np.frombuffer(raw, dtype=">u2").astype(np.int32)
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                quant_tables[tq] = vals
                i += n
            pos = seg_end
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                table = _HuffDecoder(bits, vals)
                (ac_tables if tc else dc_tables)[th] = table
                i += 17 + n
            pos = seg_end
        elif marker == 0xDD:  # DRI
            restart_interval = _u16(body, 0)
            pos = seg_end
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if img is not None:
                raise JpegDecodeError("multiple SOF")
            precision = body[0]
            if precision != 8:
                raise JpegDecodeError(f"unsupported precision {precision}")
            height = _u16(body, 1)
            width = _u16(body, 3)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(DecodedComponent(cid, hv >> 4, hv & 0x0F, tq))
            max_h = max(c.h for c in comps)
            max_v = max(c.v for c in comps)
            mcu_cols = -(-width // (8 * max_h))
            mcu_rows = -(-height // (8 * max_v))
            for c in comps:
                c.rows = mcu_rows * c.v
                c.cols = mcu_cols * c.h
                # Non-interleaved grid per T.81 A.2.2: ceil(ceil(dim*f/max)/8)
                comp_w = -(-width * c.h // max_h)
                comp_h = -(-height * c.v // max_v)
                c.ni_cols = -(-comp_w // 8)
                c.ni_rows = -(-comp_h // 8)
                c.coeffs = np.zeros((c.rows, c.cols, 64), np.int32)
            img = DecodedImage(
                width, height, marker == 0xC2, comps, quant_tables,
            )
            pos = seg_end
        elif marker == 0xDA:  # SOS
            if img is None:
                raise JpegDecodeError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (x for x in img.components if x.id == cs), None
                )
                if comp is None:
                    raise JpegDecodeError(f"SOS references unknown id {cs}")
                comp.dc_tab, comp.ac_tab = tabs >> 4, tabs & 0x0F
                scan_comps.append(comp)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if ahal != 0:
                raise JpegDecodeError("successive approximation unsupported")
            pos = _decode_scan(
                data, seg_end, img, scan_comps, ss, se,
                dc_tables, ac_tables, restart_interval, max_h, max_v,
            )
            img.num_scans += 1
        else:
            raise JpegDecodeError(f"unhandled marker 0xFF{marker:02X}")

    if img is None:
        raise JpegDecodeError("no SOF")
    img.restart_interval = restart_interval
    img.app_segments = app_segments
    img.comment = comment
    return img


def _decode_scan(
    data: bytes,
    pos: int,
    img: DecodedImage,
    scan_comps: List[DecodedComponent],
    ss: int,
    se: int,
    dc_tables: Dict[int, _HuffDecoder],
    ac_tables: Dict[int, _HuffDecoder],
    restart_interval: int,
    max_h: int,
    max_v: int,
) -> int:
    """Entropy-decode one scan; returns the byte offset of the next marker."""
    reader = _BitReader(data, pos)
    preds = {c.id: 0 for c in scan_comps}
    eobrun = 0

    interleaved = len(scan_comps) > 1
    if interleaved:
        mcu_cols = -(-img.width // (8 * max_h))
        mcu_rows = -(-img.height // (8 * max_v))
        total_units = mcu_rows * mcu_cols
    else:
        c = scan_comps[0]
        total_units = c.ni_rows * c.ni_cols

    emit_dc = ss == 0
    emit_ac = se > 0
    if emit_ac and interleaved and img.progressive:
        raise JpegDecodeError("progressive AC scans must be non-interleaved")

    def decode_block(comp: DecodedComponent, row: int, col: int):
        nonlocal eobrun
        block = comp.coeffs[row, col]
        if emit_dc:
            t = dc_tables.get(comp.dc_tab)
            if t is None:
                raise JpegDecodeError(f"missing DC table {comp.dc_tab}")
            size = t.decode(reader)
            diff = _extend(reader.receive(size), size)
            preds[comp.id] += diff
            block[0] = preds[comp.id]
        if not emit_ac:
            return
        if eobrun > 0:
            eobrun -= 1
            return
        t = ac_tables.get(comp.ac_tab)
        if t is None:
            raise JpegDecodeError(f"missing AC table {comp.ac_tab}")
        k = max(ss, 1)
        while k <= se:
            rs = t.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                # EOBn: run of 2^r + extra bits (T.81 G.1.2.2); baseline
                # EOB is the r == 0 case.
                eobrun = (1 << r) - 1 + reader.receive(r)
                break
            k += r
            if k > se:
                raise JpegDecodeError("AC run past end of band")
            block[k] = _extend(reader.receive(s), s)
            k += 1

    rst_index = 0
    units_done = 0
    while units_done < total_units:
        if restart_interval and units_done and units_done % restart_interval == 0:
            reader.align()
            m = reader.consume_marker()
            if not (0xD0 <= m <= 0xD7):
                raise JpegDecodeError(f"expected RST, got 0xFF{m:02X}")
            if (m & 7) != (rst_index & 7):
                raise JpegDecodeError(
                    f"RST out of order: got {m & 7}, want {rst_index & 7}"
                )
            rst_index += 1
            for cid in preds:
                preds[cid] = 0
            eobrun = 0

        if interleaved:
            mcu = units_done
            mr, mc = divmod(mcu, mcu_cols)
            for comp in scan_comps:
                for dv in range(comp.v):
                    for dh in range(comp.h):
                        decode_block(
                            comp, mr * comp.v + dv, mc * comp.h + dh
                        )
        else:
            comp = scan_comps[0]
            r, c = divmod(units_done, comp.ni_cols)
            decode_block(comp, r, c)
        units_done += 1

    reader.align()
    return reader.pos
