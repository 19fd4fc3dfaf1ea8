"""ctypes bindings to the native C++ entropy packer.

The reference's serial bit-writer hot loop (``writer.rs:331-388``) is
replaced by a native, multithreaded packer (``native/entropy.cpp``) that
exploits the two parallelism seams JPEG offers:

* restart segments are bitstream-independent (byte-aligned, DC reset) and
  encode on separate threads;
* without restarts, the block stream is chunked anyway — each chunk's
  starting DC predictors are known in advance from the coefficient data —
  and the resulting bit-granular chunk streams are shift-merged and
  0xFF-stuffed in a final pass.

The shared library is built on demand with g++ -O3 and cached next to the
source.  ``encode_scan`` returns None when the library is unavailable so the
caller can fall back to the byte-exact Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "entropy.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libtpuenc_entropy.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SRC):
            _lib_failed = True
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        lib.tpuenc_stuff_segments.restype = ctypes.c_longlong
        lib.tpuenc_stuff_segments.argtypes = [
            ctypes.c_void_p,   # in bytes
            ctypes.c_void_p,   # seg_lens int64*
            ctypes.c_longlong, # n_segs
            ctypes.c_void_p,   # out
            ctypes.c_longlong, # out capacity
        ]
        lib.tpuenc_realign_segments.restype = ctypes.c_longlong
        lib.tpuenc_realign_segments.argtypes = [
            ctypes.c_void_p,   # in bytes (bit-granular stream)
            ctypes.c_void_p,   # seg_bits int64*
            ctypes.c_longlong, # n_segs
            ctypes.c_int,      # num_threads
            ctypes.c_void_p,   # out
            ctypes.c_longlong, # out capacity
            ctypes.c_int,      # skip_first (segment 0 = offset, not emitted)
        ]
        lib.tpuenc_encode_scan.restype = ctypes.c_longlong
        lib.tpuenc_encode_scan.argtypes = [
            ctypes.c_void_p,   # blocks int16 (B,64)
            ctypes.c_longlong, # n_blocks
            ctypes.c_void_p,   # comp_ids int32 (B,) or NULL
            ctypes.c_void_p,   # dc_sizes uint8 (4,256)
            ctypes.c_void_p,   # dc_codes uint16 (4,256)
            ctypes.c_void_p,   # ac_sizes uint8 (4,256)
            ctypes.c_void_p,   # ac_codes uint16 (4,256)
            ctypes.c_longlong, # restart_interval_blocks
            ctypes.c_int,      # spectral_start
            ctypes.c_int,      # spectral_end
            ctypes.c_int,      # emit_dc
            ctypes.c_int,      # emit_ac
            ctypes.c_int,      # num_threads
            ctypes.c_void_p,   # out buffer
            ctypes.c_longlong, # out capacity
        ]
        lib.tpuenc_stuff_stream.restype = ctypes.c_longlong
        lib.tpuenc_stuff_stream.argtypes = [
            ctypes.c_void_p,   # in bytes
            ctypes.c_longlong, # in_len
            ctypes.c_longlong, # bit offset
            ctypes.c_longlong, # whole output bytes
            ctypes.c_int,      # num_threads
            ctypes.c_void_p,   # out
            ctypes.c_longlong, # out capacity
        ]
        lib.tpuenc_build_k2.restype = ctypes.c_int32
        lib.tpuenc_build_k2.argtypes = [
            ctypes.c_void_p,   # freq int64 (257,)
            ctypes.c_void_p,   # lengths out uint8 (16,)
            ctypes.c_void_p,   # values out uint8 (256,)
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode_scan(
    blocks: np.ndarray,
    comp_ids: Optional[np.ndarray],
    dc_tables: Sequence,
    ac_tables: Sequence,
    restart_interval_blocks: int = 0,
    spectral_start: int = 1,
    spectral_end: int = 64,
    emit_dc: bool = True,
    emit_ac: bool = True,
    num_threads: int = 0,
) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None

    blocks = np.ascontiguousarray(blocks, dtype=np.int16)
    B = blocks.shape[0]

    dc_sizes = np.zeros((4, 256), dtype=np.uint8)
    dc_codes = np.zeros((4, 256), dtype=np.uint16)
    ac_sizes = np.zeros((4, 256), dtype=np.uint8)
    ac_codes = np.zeros((4, 256), dtype=np.uint16)
    for i, t in enumerate(dc_tables):
        if t is not None:
            dc_sizes[i] = t.sizes
            dc_codes[i] = t.codes
    for i, t in enumerate(ac_tables):
        if t is not None:
            ac_sizes[i] = t.sizes
            ac_codes[i] = t.codes

    if comp_ids is not None:
        comp_ids = np.ascontiguousarray(comp_ids, dtype=np.int32)
        cid_ptr = comp_ids.ctypes.data_as(ctypes.c_void_p)
    else:
        cid_ptr = None

    # Worst case ~2 stuffed bytes per 16 bits per coefficient plus markers.
    capacity = max(4096, B * 64 * 4 + (B // max(restart_interval_blocks, 1) + 8) * 2)
    out = np.empty(capacity, dtype=np.uint8)

    n = lib.tpuenc_encode_scan(
        blocks.ctypes.data_as(ctypes.c_void_p),
        B,
        cid_ptr,
        dc_sizes.ctypes.data_as(ctypes.c_void_p),
        dc_codes.ctypes.data_as(ctypes.c_void_p),
        ac_sizes.ctypes.data_as(ctypes.c_void_p),
        ac_codes.ctypes.data_as(ctypes.c_void_p),
        restart_interval_blocks,
        spectral_start,
        spectral_end,
        1 if emit_dc else 0,
        1 if emit_ac else 0,
        num_threads or (os.cpu_count() or 1),
        out.ctypes.data_as(ctypes.c_void_p),
        capacity,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def stuff_segments(data: bytes, seg_lens) -> Optional[bytes]:
    """Apply 0xFF stuffing per segment and insert RST markers between
    segments.  ``data`` holds the concatenated byte-aligned segments.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    seg_lens = np.ascontiguousarray(seg_lens, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = 2 * len(data) + 2 * len(seg_lens) + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpuenc_stuff_segments(
        buf.ctypes.data_as(ctypes.c_void_p),
        seg_lens.ctypes.data_as(ctypes.c_void_p),
        len(seg_lens),
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def realign_segments(data: bytes, seg_bits, num_threads: int = 0,
                     bit_offset: int = 0) -> Optional[bytes]:
    """Assemble a scan from a *bit-granular* device stream: per restart
    segment, shift to byte alignment, 1-pad the tail, 0xFF-stuff and insert
    RST markers.  ``seg_bits`` holds per-segment BIT lengths; segment s
    starts at bit offset ``bit_offset`` + sum(seg_bits[:s]).  Returns None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    seg_bits = np.ascontiguousarray(seg_bits, dtype=np.int64)
    if bit_offset:
        seg_bits = np.concatenate([[bit_offset], seg_bits])
    buf = np.frombuffer(data, dtype=np.uint8)
    total_bytes = int(seg_bits.sum()) // 8 + len(seg_bits)
    cap = 2 * total_bytes + 2 * len(seg_bits) + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpuenc_realign_segments(
        buf.ctypes.data_as(ctypes.c_void_p),
        seg_bits.ctypes.data_as(ctypes.c_void_p),
        len(seg_bits),
        num_threads or (os.cpu_count() or 1),
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
        1 if bit_offset else 0,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def realign_segments_py(data: bytes, seg_bits, bit_offset: int = 0) -> bytes:
    """Pure-Python fallback for :func:`realign_segments`."""
    out = bytearray()
    bit_off = bit_offset
    for s, nbits in enumerate(seg_bits):
        nbits = int(nbits)
        if s > 0:
            out += bytes((0xFF, 0xD0 + ((s - 1) & 7)))
        # Extract bits [bit_off, bit_off + nbits) from the stream.
        b0 = bit_off >> 3
        b1 = (bit_off + nbits + 7) >> 3
        window = int.from_bytes(data[b0:b1], "big")
        win_bits = (b1 - b0) * 8
        drop = win_bits - (bit_off & 7) - nbits
        seg = (window >> drop) & ((1 << nbits) - 1) if nbits else 0
        pad = (-nbits) % 8
        seg = (seg << pad) | ((1 << pad) - 1)
        raw = seg.to_bytes((nbits + pad) // 8, "big")
        out += raw.replace(b"\xff", b"\xff\x00")
        bit_off += nbits
    return bytes(out)


def stuff_segments_py(data: bytes, seg_lens) -> bytes:
    """Pure-Python fallback for :func:`stuff_segments`."""
    out = bytearray()
    ip = 0
    for s, ln in enumerate(seg_lens):
        if s > 0:
            out += bytes((0xFF, 0xD0 + ((s - 1) & 7)))
        chunk = data[ip : ip + ln]
        ip += ln
        out += chunk.replace(b"\xff", b"\xff\x00")
    return bytes(out)


def build_k2(freq: np.ndarray):
    """Native Annex K.2 table build (see tpuenc_build_k2 in entropy.cpp).
    Returns (lengths[16], values) or None when the library is unavailable
    or the histogram is degenerate."""
    lib = _load()
    if lib is None:
        return None
    freq = np.ascontiguousarray(freq, dtype=np.int64)
    if freq.shape != (257,):
        raise ValueError(f"expected 257-bin histogram, got {freq.shape}")
    lengths = np.zeros(16, dtype=np.uint8)
    values = np.zeros(256, dtype=np.uint8)
    n = lib.tpuenc_build_k2(
        freq.ctypes.data, lengths.ctypes.data, values.ctypes.data
    )
    if n < 0:
        return None
    return lengths.tolist(), values[:n].tolist()


def stuff_stream(data, bit_off: int, nbytes: int,
                 num_threads: int = 0) -> Optional[bytes]:
    """Extract output bytes [bit_off, bit_off + 8*nbytes) of a raw
    bitstream and 0xFF-stuff them (no padding, no markers) — the
    StreamingStuffer's bulk mid-segment flush, chunk-parallel in native
    code.  Returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(memoryview(data), dtype=np.uint8)
    cap = 2 * nbytes + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.tpuenc_stuff_stream(
        buf.ctypes.data_as(ctypes.c_void_p),
        len(buf),
        bit_off,
        nbytes,
        num_threads or (os.cpu_count() or 1),
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()
