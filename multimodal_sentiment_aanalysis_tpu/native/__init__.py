"""Native (C++) data-runtime bindings.

Loads ``libdataruntime.so`` via ctypes, building it on demand with the
in-image g++ toolchain (cached next to the source). Every entry point has a
numpy fallback so the package works without a compiler; ``available()``
reports which path is active.

Exposed ops (see ``dataruntime.cpp`` for reference-file citations):

- :func:`nan_to_num_`       — in-place NaN/Inf scrub
- :func:`zscore_columns_`   — in-place per-feature z-score, std==0 guard
- :func:`global_norm_`      — in-place global z-score + min-max
- :func:`build_pairs`       — balanced within-subject contrastive pairs
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdataruntime.so")
_SRC = os.path.join(_HERE, "dataruntime.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-Wall",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, u64, i32p = ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.msa_nan_to_num.argtypes = [f32p, i64]
        lib.msa_zscore_columns.argtypes = [f32p, i64, i64]
        lib.msa_global_norm.argtypes = [f32p, i64]
        lib.msa_build_pairs.argtypes = [i64p, i64p, i64p, i64, u64, i32p, f32p, i64]
        lib.msa_build_pairs.restype = i64
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled native runtime is loadable."""
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nan_to_num_(x: np.ndarray) -> np.ndarray:
    """In-place np.nan_to_num on a contiguous float32 array."""
    assert x.dtype == np.float32 and x.flags.c_contiguous
    lib = _load()
    if lib is None:
        np.copyto(x, np.nan_to_num(x))
        return x
    lib.msa_nan_to_num(_f32p(x), x.size)
    return x


def zscore_columns_(x: np.ndarray) -> np.ndarray:
    """In-place per-feature z-score over axis 0 of a (n, d) float32 array."""
    assert x.dtype == np.float32 and x.ndim == 2 and x.flags.c_contiguous
    lib = _load()
    if lib is None:
        mean = x.mean(axis=0, dtype=np.float64)
        std = x.std(axis=0, dtype=np.float64)
        std = np.where(std == 0, 1.0, std)
        np.copyto(x, ((x - mean) / std).astype(np.float32))
        return x
    lib.msa_zscore_columns(_f32p(x), x.shape[0], x.shape[1])
    return x


def global_norm_(x: np.ndarray) -> np.ndarray:
    """In-place global z-score then min-max (whole array)."""
    assert x.dtype == np.float32 and x.flags.c_contiguous
    lib = _load()
    if lib is None:
        mean, std = np.mean(x, dtype=np.float64), np.std(x, dtype=np.float64)
        z = (x - mean) / (std if std != 0 else 1.0)
        np.copyto(x, ((z - z.min()) / max(z.max() - z.min(), 1e-300)).astype(np.float32))
        return x
    lib.msa_global_norm(_f32p(x), x.size)
    return x


def build_pairs(
    arousal: np.ndarray,
    valence: np.ndarray,
    subject_ids: np.ndarray,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Balanced within-subject contrastive pairs (native engine).

    Same contract as :func:`..data.pairs.build_contrastive_pairs`; the RNG
    differs (splitmix64 vs numpy PCG), so the SET of semantics — within
    subject, positive iff both labels agree, class-balanced, shuffled —
    is identical but the concrete subsample is engine-specific.
    """
    lib = _load()
    if lib is None:
        from ..data.pairs import build_contrastive_pairs

        return build_contrastive_pairs(arousal, valence, subject_ids, seed)
    a = np.ascontiguousarray(arousal, np.int64)
    v = np.ascontiguousarray(valence, np.int64)
    s = np.ascontiguousarray(subject_ids, np.int64)
    n = len(a)
    # worst case: every unordered pair within each subject
    _, counts = np.unique(s, return_counts=True)
    cap = int((counts * (counts - 1) // 2).sum()) or 1
    out_pairs = np.empty((cap, 2), np.int32)
    out_labels = np.empty((cap,), np.float32)
    wrote = lib.msa_build_pairs(
        _i64p(a), _i64p(v), _i64p(s), n, ctypes.c_uint64(seed),
        out_pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _f32p(out_labels), cap,
    )
    return out_pairs[:wrote].copy(), out_labels[:wrote].copy()
