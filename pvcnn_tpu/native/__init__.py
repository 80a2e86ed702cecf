"""Native (C++) host-runtime components, compiled on first use and bound via
ctypes. Everything here has a pure-numpy fallback — `available()` says which path
is active. See ptio.cpp for what lives natively and why."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

__all__ = ["available", "loadtxt", "vote_reduce_max"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "ptio.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "pvcnn_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"ptio_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.parse_float_table.restype = ctypes.c_int64
    lib.parse_float_table.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int64]
    lib.count_float_table.restype = ctypes.c_int64
    lib.count_float_table.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.vote_reduce_max.restype = None
    lib.vote_reduce_max.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int64)]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        from pvcnn_tpu.utils import knobs

        if not knobs.get("PVCNN_TPU_NO_NATIVE"):
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return _lib() is not None


def loadtxt(path: str, num_cols: Optional[int] = None) -> np.ndarray:
    """Fast replacement for np.loadtxt on whitespace float tables.

    Returns [rows, cols] float32 (cols inferred from the first line unless
    given). Falls back to np.loadtxt when the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return np.loadtxt(path).astype(np.float32)
    with open(path, "rb") as f:
        buf = f.read()
    if num_cols is None:
        first = buf.split(b"\n", 1)[0]
        num_cols = max(len(first.split()), 1)
    count = lib.count_float_table(buf, len(buf))
    out = np.empty(count, dtype=np.float32)
    n = lib.parse_float_table(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count)
    if n < 0 or n % num_cols != 0:
        return np.loadtxt(path).astype(np.float32)
    return out[:n].reshape(-1, num_cols)


def vote_reduce_max(vote_conf: np.ndarray, vote_pred: np.ndarray,
                    point_idx: np.ndarray, out_conf: np.ndarray,
                    out_pred: np.ndarray) -> None:
    """In-place max-confidence vote reduction (first vote wins ties — the
    reference semantics). Numpy fallback uses a stable argsort sweep."""
    lib = _lib()
    if lib is not None:
        vote_conf = np.ascontiguousarray(vote_conf, dtype=np.float32)
        vote_pred = np.ascontiguousarray(vote_pred, dtype=np.int64)
        point_idx = np.ascontiguousarray(point_idx, dtype=np.int64)
        assert out_conf.dtype == np.float32 and out_conf.flags.c_contiguous
        assert out_pred.dtype == np.int64 and out_pred.flags.c_contiguous
        lib.vote_reduce_max(
            vote_conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vote_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            point_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(vote_conf),
            out_conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return
    order = np.argsort(vote_conf, kind="stable")
    idx = point_idx[order]
    cand_conf = np.full_like(out_conf, -np.inf)
    cand_pred = np.zeros_like(out_pred)
    cand_conf[idx] = vote_conf[order]
    cand_pred[idx] = vote_pred[order]
    better = cand_conf > out_conf
    out_conf[better] = cand_conf[better]
    out_pred[better] = cand_pred[better]
