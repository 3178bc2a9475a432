"""ctypes bindings for the native C++ prefetching feature-batch loader.

The reference's host data path loads one .npy per ``__getitem__`` and
builds device tensors inside the dataset (/root/reference/dataloader.py:
28-50), serializing IO with compute. ``native/s2vt_loader.cpp`` is the
TPU-era equivalent of a compiled data-loading runtime: a C++ reader pool
assembles fixed-shape [B, T, D] float32 batches into a bounded ring ahead
of consumption. This module compiles it on first use (g++ -O3 -shared) and
exposes it as an iterator.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Iterator, Sequence

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "s2vt_loader.cpp"
_BUILD_LOCK = threading.Lock()
_LIB = None


def _cache_dir() -> pathlib.Path:
    return pathlib.Path(os.environ.get(
        "S2VT_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "s2vt_tpu")))


def _lib_path() -> pathlib.Path:
    return _cache_dir() / "libs2vt_loader.so"


def build_lib(src: pathlib.Path, lib_name: str,
              force: bool = False) -> pathlib.Path:
    """Compile one of the native/ C++ sources to a cached shared library
    (shared by the feature loader and the RLE mask ops)."""
    out = _cache_dir() / lib_name
    with _BUILD_LOCK:
        if out.exists() and not force and \
                out.stat().st_mtime >= src.stat().st_mtime:
            return out
        out.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(out)],
            check=True, capture_output=True)
    return out


def build_native(force: bool = False) -> pathlib.Path:
    """Compile the loader shared library (cached)."""
    return build_lib(_SRC, "libs2vt_loader.so", force)


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(str(build_native()))
    lib.s2vt_loader_create.restype = ctypes.c_void_p
    lib.s2vt_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.s2vt_loader_begin.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int]
    lib.s2vt_loader_next.restype = ctypes.c_int
    lib.s2vt_loader_next.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.s2vt_loader_failed.restype = ctypes.c_long
    lib.s2vt_loader_failed.argtypes = [ctypes.c_void_p]
    lib.s2vt_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativeFeatureLoader:
    """Prefetching batch iterator over a fixed list of .npy feature files."""

    def __init__(self, paths: Sequence[str], feat_len: int, feat_dim: int,
                 n_threads: int = 4, queue_depth: int = 3):
        self._lib = _load_lib()
        self.paths = [str(p) for p in paths]
        self.feat_len, self.feat_dim = feat_len, feat_dim
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._handle = self._lib.s2vt_loader_create(
            arr, len(self.paths), feat_len, feat_dim, n_threads, queue_depth)
        if not self._handle:
            raise RuntimeError("s2vt_loader_create failed")
        # Epoch generation: each iter_batches() call supersedes the previous
        # one. The C++ begin() safely abandons an in-flight epoch
        # (s2vt_loader.cpp begin/abandon_gen protocol), so an abandoned
        # Python generator — e.g. a consumer that broke mid-epoch — must not
        # poison the next epoch; it simply stops if ever resumed.
        self._epoch_gen = 0

    def iter_batches(self, order: Sequence[int],
                     batch: int) -> Iterator[np.ndarray]:
        """Yield [batch, feat_len, feat_dim] float32 arrays following
        ``order`` (indices into ``paths``); the last batch is zero-padded.
        Each yielded array is freshly allocated (safe to keep)."""
        self._epoch_gen += 1
        gen = self._epoch_gen
        order_arr = np.ascontiguousarray(order, np.int32)
        # Snapshot BEFORE begin(): the pool starts loading immediately, so
        # reading the counter afterwards races the first failures.
        failed0 = self._lib.s2vt_loader_failed(self._handle)
        self._lib.s2vt_loader_begin(
            self._handle,
            order_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(order_arr), batch)
        while True:
            if self._epoch_gen != gen:
                return  # superseded by a newer epoch; don't steal its batches
            out = np.empty((batch, self.feat_len, self.feat_dim),
                           np.float32)
            valid = self._lib.s2vt_loader_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            n_failed = self._lib.s2vt_loader_failed(self._handle) - failed0
            if n_failed:
                raise RuntimeError(
                    f"{n_failed} feature file(s) failed to load "
                    f"(missing, wrong dtype/shape, or truncated .npy)")
            if valid == 0:
                break
            yield out

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.s2vt_loader_destroy(handle)
            self._handle = None
