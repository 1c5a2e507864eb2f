"""Native host-runtime bindings (C++ graph preprocessing engine).

The shared library is compiled lazily from ``graph_prep.cpp`` on first use
(g++, -O3, OpenMP when available) and cached next to the source keyed by a
source hash, so an edit triggers a rebuild and stale binaries are never
loaded. Bindings are ctypes (no pybind11 in this environment). Every entry
point has a numpy fallback in :mod:`laplace_gnn_tpu.graph.container`; this
module only *accelerates* — ``available()`` gates every call site.

Build by hand (optional): ``python -m laplace_gnn_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_prep.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _source_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:12]


def _so_path() -> str:
    return os.path.join(_DIR, f"_graph_prep_{_source_hash()}.so")


def build(verbose: bool = False) -> str:
    """Compile graph_prep.cpp to a cached shared library; returns its path."""
    so = _so_path()
    if os.path.exists(so):
        return so
    flags = ["-O3", "-shared", "-fPIC", "-std=c++17"]
    # OpenMP is optional; probe once.
    for extra in (["-fopenmp"], []):
        cmd = ["g++", *flags, *extra, _SRC, "-o"]
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        try:
            subprocess.run(cmd + [tmp], check=True,
                           capture_output=not verbose)
            os.replace(tmp, so)
            return so
        except (subprocess.CalledProcessError, FileNotFoundError):
            if os.path.exists(tmp):
                os.unlink(tmp)
            continue
    raise RuntimeError("g++ compilation of graph_prep.cpp failed")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LAPLACE_GNN_TPU_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(build())
    except Exception as e:  # toolchain missing, load failure — fall back
        print(f"laplace_gnn_tpu.native: falling back to numpy ({e})",
              file=sys.stderr)
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.lg_degree.argtypes = [i32p, f64p, ctypes.c_int64, ctypes.c_int32,
                              f64p]
    lib.lg_sort_by_dst.argtypes = [i32p, i32p, f64p, ctypes.c_int64,
                                   ctypes.c_int32, i32p, i32p, f64p, i64p]
    lib.lg_lexsort2.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32,
                                i64p]
    lib.lg_check_symmetric.argtypes = [i32p, i32p, f64p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_double,
                                       ctypes.c_double]
    lib.lg_check_symmetric.restype = ctypes.c_int
    lib.lg_choose_k.argtypes = [i64p, ctypes.c_int32, ctypes.c_double]
    lib.lg_choose_k.restype = ctypes.c_int32
    lib.lg_rem_count.argtypes = [i64p, ctypes.c_int32, ctypes.c_int32]
    lib.lg_rem_count.restype = ctypes.c_int64
    lib.lg_ell_pack.argtypes = [i32p, f64p, i64p, ctypes.c_int32,
                                ctypes.c_int32, i32p, f64p, i32p, i32p, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _as(a, dtype) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=dtype)


def degree(dst, w, n_nodes: int) -> np.ndarray:
    """Weighted in-degree (== np.add.at(deg, dst, w))."""
    lib = _load()
    dst = _as(dst, np.int32)
    w = _as(w, np.float64)
    out = np.zeros(n_nodes, np.float64)
    lib.lg_degree(_p(dst, ctypes.c_int32), _p(w, ctypes.c_double),
                  len(dst), n_nodes, _p(out, ctypes.c_double))
    return out


def sort_by_dst(src, dst, w, n_nodes: int
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stable sort edges by dst; returns (src, dst, w, csr_offsets)."""
    lib = _load()
    src = _as(src, np.int32)
    dst = _as(dst, np.int32)
    w = _as(w, np.float64)
    E = len(src)
    so = np.empty(E, np.int32)
    do = np.empty(E, np.int32)
    wo = np.empty(E, np.float64)
    offs = np.empty(n_nodes + 1, np.int64)
    lib.lg_sort_by_dst(_p(src, ctypes.c_int32), _p(dst, ctypes.c_int32),
                       _p(w, ctypes.c_double), E, n_nodes,
                       _p(so, ctypes.c_int32), _p(do, ctypes.c_int32),
                       _p(wo, ctypes.c_double), _p(offs, ctypes.c_int64))
    return so, do, wo, offs


def check_symmetric(src, dst, w, n_nodes: int, rtol: float = 1e-5,
                    atol: float = 1e-8) -> bool:
    lib = _load()
    src = _as(src, np.int32)
    dst = _as(dst, np.int32)
    w = _as(w, np.float64)
    return bool(lib.lg_check_symmetric(
        _p(src, ctypes.c_int32), _p(dst, ctypes.c_int32),
        _p(w, ctypes.c_double), len(src), n_nodes, rtol, atol))


def choose_k(offsets: np.ndarray, pad_budget: float) -> int:
    lib = _load()
    offsets = _as(offsets, np.int64)
    return int(lib.lg_choose_k(_p(offsets, ctypes.c_int64),
                               len(offsets) - 1, pad_budget))


def ell_pack(src_sorted, w_sorted, offsets, K: int
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                        np.ndarray]:
    """Pack dst-sorted edges into (N, K) ELL + COO remainder.

    Returns (cols, vals, rem_src, rem_dst, rem_w)."""
    lib = _load()
    src_sorted = _as(src_sorted, np.int32)
    w_sorted = _as(w_sorted, np.float64)
    offsets = _as(offsets, np.int64)
    n = len(offsets) - 1
    rem_n = int(lib.lg_rem_count(_p(offsets, ctypes.c_int64), n, K))
    cols = np.zeros((n, K), np.int32)
    vals = np.zeros((n, K), np.float64)
    rem_src = np.empty(rem_n, np.int32)
    rem_dst = np.empty(rem_n, np.int32)
    rem_w = np.empty(rem_n, np.float64)
    lib.lg_ell_pack(_p(src_sorted, ctypes.c_int32),
                    _p(w_sorted, ctypes.c_double),
                    _p(offsets, ctypes.c_int64), n, K,
                    _p(cols, ctypes.c_int32), _p(vals, ctypes.c_double),
                    _p(rem_src, ctypes.c_int32), _p(rem_dst, ctypes.c_int32),
                    _p(rem_w, ctypes.c_double))
    return cols, vals, rem_src, rem_dst, rem_w
