"""ctypes bridge to the native C++ runtime (libbwbble_native.so).

The native library provides the host-side heavy lifting the reference does in
C/C++ (mg-aligner/is.c SA-IS, bwt.c index construction, io.c packing): SA-IS
suffix-array construction, BWT/occ/SA-sample builds, and 4-bit packing.  It is
built from native/ via `python -m bwbble_tpu.build_native` (or the Makefile)
and loaded lazily; every caller has a numpy fallback so the pure-Python path
stays functional.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_lock = threading.Lock()
_native = None
_tried = False


def _lib_candidates():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    for d in (os.path.join(here, "_lib"), os.path.join(root, "native", "build"), root):
        yield os.path.join(d, "libbwbble_native.so")


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.bwbble_sais_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64]
        lib.bwbble_sais_u8.restype = ctypes.c_int
        lib.bwbble_build_occ.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.bwbble_build_occ.restype = None
        self._has_fastq = hasattr(lib, "bwbble_fastq_scan")
        if self._has_fastq:
            lib.bwbble_fastq_scan.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.bwbble_fastq_scan.restype = ctypes.c_int64
            lib.bwbble_fastq_fill.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.bwbble_fastq_fill.restype = ctypes.c_int

    def suffix_array(self, seq: np.ndarray) -> np.ndarray:
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        n = seq.shape[0]
        out = np.empty(n, dtype=np.int64)
        rc = self._lib.bwbble_sais_u8(
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n))
        if rc != 0:
            raise RuntimeError(f"native SA-IS failed with code {rc}")
        return out

    def build_occ(self, bwt: np.ndarray, sa0: int, interval: int) -> np.ndarray:
        """Occurrence checkpoints [num_occ, 16], inclusive at k*interval,
        skipping the sa0 sentinel row (compute_O, bwt.c:280-291)."""
        bwt = np.ascontiguousarray(bwt, dtype=np.uint8)
        n = bwt.shape[0]
        num_occ = (n + interval - 1) // interval
        out = np.zeros((num_occ, 16), dtype=np.int64)
        self._lib.bwbble_build_occ(
            bwt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int64(sa0), ctypes.c_int64(interval),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out


    def parse_fastq(self, data: bytes):
        """Two-pass FASTQ parse into fixed-shape nt4 batches; returns
        (seq, rc, lengths, name_off, name_len, qual_off) or None if the
        library predates the parser or the input is malformed (the caller
        falls back to the Python parser for proper error reporting)."""
        if not self._has_fastq:
            return None
        buf = np.frombuffer(data, dtype=np.uint8)
        n = buf.shape[0]
        ml = ctypes.c_int64(0)
        p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        count = self._lib.bwbble_fastq_scan(p, n, ctypes.byref(ml))
        if count < 0:
            return None
        count, max_len = int(count), int(ml.value)
        seq = np.full((count, max_len), 4, dtype=np.int8)
        rc = np.full((count, max_len), 4, dtype=np.int8)
        lengths = np.zeros(count, dtype=np.int32)
        name_off = np.zeros(count, dtype=np.int64)
        name_len = np.zeros(count, dtype=np.int64)
        qual_off = np.zeros(count, dtype=np.int64)
        rcode = self._lib.bwbble_fastq_fill(
            p, n, count, max_len,
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            name_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            name_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            qual_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rcode != 0:
            return None
        return seq, rc, lengths, name_off, name_len, qual_off


def get_native():
    """Return the native bridge, or None if the library isn't built."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    with _lock:
        if _native is None and not _tried:
            for path in _lib_candidates():
                if os.path.exists(path):
                    try:
                        _native = _Native(ctypes.CDLL(path))
                        break
                    except OSError:
                        continue
            _tried = True
    return _native
