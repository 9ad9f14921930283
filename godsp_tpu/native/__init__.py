"""ctypes bindings for the native host ops (godsp_native.cpp).

Lazily compiles the shared library with g++ on first use (cached beside
the source); every entry point has a pure-numpy fallback, so the package
works identically without a toolchain — `available()` reports which path
is active.  Device compute is unaffected: these ops only feed the host
side of the pipeline (WAV decode, frame copies, stream buffering).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "available",
    "decode_u8",
    "decode_i16",
    "frame_signal",
    "StreamBuffer",
]

log = logging.getLogger("godsp_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "godsp_native.cpp")
_SO = os.path.join(_DIR, "libgodsp_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    tmp = f"{_SO}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _SO)  # atomic: safe under concurrent builders
        return True
    except Exception as e:  # toolchain missing / sandboxed build dir
        log.info("native build unavailable, using numpy fallbacks: %s", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.info("native load failed, using numpy fallbacks: %s", e)
            return None
        c_i64, c_p = ctypes.c_int64, ctypes.c_void_p
        lib.gdsp_decode_u8.argtypes = [c_p, c_p, c_i64]
        lib.gdsp_decode_i16.argtypes = [c_p, c_p, c_i64]
        lib.gdsp_frame_f32.argtypes = [c_p, c_p, c_i64, c_i64, c_i64]
        lib.gdsp_frame_f64.argtypes = [c_p, c_p, c_i64, c_i64, c_i64]
        lib.gdsp_sbuf_new.argtypes = [c_i64]
        lib.gdsp_sbuf_new.restype = c_p
        lib.gdsp_sbuf_free.argtypes = [c_p]
        lib.gdsp_sbuf_size.argtypes = [c_p]
        lib.gdsp_sbuf_size.restype = c_i64
        lib.gdsp_sbuf_push.argtypes = [c_p, c_p, c_i64]
        lib.gdsp_sbuf_push.restype = ctypes.c_int
        lib.gdsp_sbuf_peek.argtypes = [c_p, c_p, c_i64]
        lib.gdsp_sbuf_peek.restype = c_i64
        lib.gdsp_sbuf_consume.argtypes = [c_p, c_i64]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled native library is in use."""
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def decode_u8(data: np.ndarray) -> np.ndarray:
    """uint8 -> float32 v/255 in [0, 1] (wav.go:147-150 quirk parity)."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return data.astype(np.float32) / 255.0
    out = np.empty(data.shape, dtype=np.float32)
    lib.gdsp_decode_u8(_ptr(data), _ptr(out), data.size)
    return out


def decode_i16(data: np.ndarray) -> np.ndarray:
    """int16 -> float32 (v+32768)/65535 in [0, 1] (wav.go:151-155)."""
    data = np.ascontiguousarray(data, dtype=np.int16)
    lib = _load()
    if lib is None:
        return (data.astype(np.float32) + 32768.0) / 65535.0
    out = np.empty(data.shape, dtype=np.float32)
    lib.gdsp_decode_i16(_ptr(data), _ptr(out), data.size)
    return out


def frame_signal(x: np.ndarray, nfft: int, stride: int) -> np.ndarray:
    """Host-side overlapped framing: (nsegs, nfft) copies with
    nsegs = (len - nfft)//stride + 1 (spectral.go:26-44 semantics)."""
    x = np.ascontiguousarray(x)
    if x.ndim != 1:
        raise ValueError("frame_signal expects a 1-D signal")
    if stride <= 0:
        raise ValueError("stride must be positive")
    nsegs = (x.shape[0] - nfft) // stride + 1
    if nsegs <= 0:
        return np.zeros((0, nfft), dtype=x.dtype)
    lib = _load()
    if lib is None or x.dtype not in (np.float32, np.float64):
        idx = np.arange(nsegs)[:, None] * stride + np.arange(nfft)[None, :]
        return x[idx]
    out = np.empty((nsegs, nfft), dtype=x.dtype)
    fn = lib.gdsp_frame_f32 if x.dtype == np.float32 else lib.gdsp_frame_f64
    fn(_ptr(x), _ptr(out), nsegs, nfft, stride)
    return out


class StreamBuffer:
    """Growable FIFO of samples (native byte ring with compaction; numpy
    fallback).  Backs StreamingPwelch's chunk assembly: push blocks, peek
    chunk+halo, consume chunk.  dtype-agnostic — lengths are in samples
    of the configured dtype."""

    def __init__(self, capacity: int = 1 << 20, dtype=np.float64):
        self._dt = np.dtype(dtype)
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.gdsp_sbuf_new(int(capacity) * self._dt.itemsize)
            if not self._h:
                raise MemoryError("gdsp_sbuf_new failed")
        else:
            self._buf = np.zeros(0, dtype=self._dt)

    @property
    def dtype(self) -> np.dtype:
        return self._dt

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_h", None):
            lib.gdsp_sbuf_free(self._h)
            self._h = None

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.gdsp_sbuf_size(self._h)) // self._dt.itemsize
        return self._buf.shape[0]

    def push(self, samples: np.ndarray) -> None:
        samples = np.ascontiguousarray(samples, dtype=self._dt).reshape(-1)
        if self._lib is not None:
            if self._lib.gdsp_sbuf_push(self._h, _ptr(samples), samples.nbytes):
                raise MemoryError("gdsp_sbuf_push failed")
        else:
            self._buf = np.concatenate([self._buf, samples])

    def peek(self, n: int) -> np.ndarray:
        """First min(n, len) buffered samples, without consuming."""
        if self._lib is not None:
            out = np.empty(n, dtype=self._dt)
            m = int(self._lib.gdsp_sbuf_peek(self._h, _ptr(out), out.nbytes))
            return out[: m // self._dt.itemsize]
        return self._buf[:n].copy()

    def consume(self, n: int) -> None:
        if self._lib is not None:
            self._lib.gdsp_sbuf_consume(self._h, int(n) * self._dt.itemsize)
        else:
            self._buf = self._buf[n:]
