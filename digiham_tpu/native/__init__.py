"""Native host-runtime bindings (C++ via ctypes).

Builds ``digiham_native.cpp`` on first use (cached as a .so alongside the
source) and exposes the stream plumbing primitives: SPSC ring buffer,
packing kernels, sync-pattern scanning, and interleaved-stream deframing.
Every entry point has a pure-numpy fallback so the package works where no
compiler is available (``HAVE_NATIVE`` reports which path is active).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "digiham_native.cpp")
_SO = os.path.join(_HERE, "src", "digiham_native.so")
_HASH = _SO + ".srchash"

_lib = None
_lock = threading.Lock()


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> str | None:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if res.returncode != 0:
        print("digiham_native build failed:\n" + res.stderr.decode(),
              file=sys.stderr)
        return None
    try:
        with open(_HASH, "w") as f:
            f.write(_src_hash())
    except OSError:
        pass
    return _SO


def _so_is_fresh() -> bool:
    """The .so is usable only if it was built from the current source —
    checked by content hash, not mtime (a stale or foreign-architecture
    binary must never be trusted just because it exists)."""
    if not os.path.exists(_SO):
        return False
    try:
        with open(_HASH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _SO if _so_is_fresh() else _build()
        if path is None or not os.path.exists(path):
            return None
        try:
            return _bind(ctypes.CDLL(path))
        except (OSError, AttributeError):
            # wrong-arch or symbol-incomplete binary: rebuild once, else
            # fall back to the pure-numpy path (return None).
            if _build() is None:
                return None
            try:
                return _bind(ctypes.CDLL(_SO))
            except (OSError, AttributeError):
                return None


def _bind(lib):
    """Set argtypes/restypes; raises AttributeError on missing symbols."""
    global _lib
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dh_hamming_distance.restype = ctypes.c_int32
    lib.dh_hamming_distance.argtypes = [u8p, u8p, ctypes.c_size_t]
    lib.dh_sync_scan.restype = ctypes.c_int64
    lib.dh_sync_scan.argtypes = [u8p, ctypes.c_size_t, u8p,
                                 ctypes.c_size_t, ctypes.c_int32]
    lib.dh_sync_distances.restype = None
    lib.dh_sync_distances.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32)]
    for name in ("dh_pack_dibits", "dh_pack_bits_msb",
                 "dh_pack_bits_lsb", "dh_unpack_dibits"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.dh_rb_create.restype = ctypes.c_void_p
    lib.dh_rb_create.argtypes = [ctypes.c_size_t]
    lib.dh_rb_destroy.restype = None
    lib.dh_rb_destroy.argtypes = [ctypes.c_void_p]
    for name in ("dh_rb_available", "dh_rb_writeable"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p]
    lib.dh_rb_write.restype = ctypes.c_uint64
    lib.dh_rb_write.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.dh_rb_peek.restype = ctypes.c_uint64
    lib.dh_rb_peek.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.dh_rb_consume.restype = ctypes.c_uint64
    lib.dh_rb_consume.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.dh_deinterleave_f32.restype = None
    lib.dh_deinterleave_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_float)]
    lib.dh_viterbi.restype = ctypes.c_int64
    lib.dh_viterbi.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                               ctypes.c_int32, u8p]
    _lib = lib
    return lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


HAVE_NATIVE = _load() is not None


def hamming_distance(a, b) -> int:
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    lib = _load()
    if lib is not None:
        return int(lib.dh_hamming_distance(_u8(a), _u8(b), a.size))
    return int(np.unpackbits(a ^ b).sum())


def sync_scan(data, pattern, max_dist: int) -> int:
    """First offset with hamming distance <= max_dist, or -1."""
    data = np.ascontiguousarray(data, np.uint8)
    pattern = np.ascontiguousarray(pattern, np.uint8)
    lib = _load()
    if lib is not None:
        return int(lib.dh_sync_scan(_u8(data), data.size, _u8(pattern),
                                    pattern.size, max_dist))
    if data.size < pattern.size:
        return -1
    win = np.lib.stride_tricks.sliding_window_view(data, pattern.size)
    dist = np.unpackbits(win ^ pattern, axis=1).sum(axis=1)
    hits = np.nonzero(dist <= max_dist)[0]
    return int(hits[0]) if len(hits) else -1


def sync_distances(data, pattern) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    pattern = np.ascontiguousarray(pattern, np.uint8)
    n = data.size - pattern.size + 1
    lib = _load()
    if lib is not None and n > 0:
        out = np.zeros(n, np.int32)
        lib.dh_sync_distances(_u8(data), data.size, _u8(pattern),
                              pattern.size,
                              out.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_int32)))
        return out
    win = np.lib.stride_tricks.sliding_window_view(data, pattern.size)
    return np.unpackbits(win ^ pattern, axis=1).sum(axis=1).astype(np.int32)


def pack_dibits(dibits) -> bytes:
    d = np.ascontiguousarray(dibits, np.uint8)
    out = np.zeros((d.size + 3) // 4, np.uint8)
    lib = _load()
    if lib is not None:
        lib.dh_pack_dibits(_u8(d), d.size, _u8(out))
        return out.tobytes()
    for i in range(d.size):
        out[i // 4] |= (d[i] & 3) << (6 - 2 * (i % 4))
    return out.tobytes()


def pack_bits_lsb(bits) -> bytes:
    b = np.ascontiguousarray(bits, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.zeros((b.size + 7) // 8, np.uint8)
        lib.dh_pack_bits_lsb(_u8(b), b.size, _u8(out))
        return out.tobytes()
    return np.packbits(b, bitorder="little").tobytes()


def pack_bits_msb(bits) -> bytes:
    b = np.ascontiguousarray(bits, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.zeros((b.size + 7) // 8, np.uint8)
        lib.dh_pack_bits_msb(_u8(b), b.size, _u8(out))
        return out.tobytes()
    return np.packbits(b).tobytes()


def deinterleave_f32(interleaved: np.ndarray, channels: int) -> np.ndarray:
    """[frames*channels] interleaved f32 -> [channels, frames]."""
    x = np.ascontiguousarray(interleaved, np.float32)
    frames = x.size // channels
    lib = _load()
    if lib is not None:
        out = np.zeros((channels, frames), np.float32)
        lib.dh_deinterleave_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames,
            channels,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return x[:frames * channels].reshape(frames, channels).T.copy()


def viterbi(dibits: np.ndarray, num_states: int = 16,
            blocked_steps: int = 0):
    """Native 16/4-state Viterbi: [T] dibits -> (bits [T], metric).
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dibits, np.uint8)
    out = np.zeros(d.size, np.uint8)
    metric = lib.dh_viterbi(_u8(d), d.size, num_states, blocked_steps,
                            _u8(out))
    if metric < 0:
        return None
    return out, int(metric)


class RingBuffer:
    """Native SPSC byte ring buffer (falls back to a locked bytearray)."""

    def __init__(self, capacity: int = 1 << 20):
        self._lib = _load()
        if self._lib is not None:
            self._handle = self._lib.dh_rb_create(capacity)
            if not self._handle:
                raise MemoryError("ring buffer allocation failed")
        else:
            self._buf = bytearray()
            self._cap = capacity
            self._pylock = threading.Lock()

    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.dh_rb_available(self._handle))
        with self._pylock:
            return len(self._buf)

    def write(self, data: bytes) -> int:
        data = bytes(data)
        if self._lib is not None:
            arr = np.frombuffer(data, np.uint8)
            return int(self._lib.dh_rb_write(self._handle, _u8(arr),
                                             len(data)))
        with self._pylock:
            n = min(len(data), self._cap - len(self._buf))
            self._buf.extend(data[:n])
            return n

    def peek(self, n: int) -> bytes:
        if self._lib is not None:
            out = np.zeros(n, np.uint8)
            got = int(self._lib.dh_rb_peek(self._handle, _u8(out), n))
            return out[:got].tobytes()
        with self._pylock:
            return bytes(self._buf[:n])

    def consume(self, n: int) -> int:
        if self._lib is not None:
            return int(self._lib.dh_rb_consume(self._handle, n))
        with self._pylock:
            n = min(n, len(self._buf))
            del self._buf[:n]
            return n

    def __del__(self):
        if getattr(self, "_lib", None) is not None and \
                getattr(self, "_handle", None):
            self._lib.dh_rb_destroy(self._handle)
            self._handle = None
