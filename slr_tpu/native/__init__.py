"""Native (C++) host-side runtime components, bound via ctypes.

The reference's scene-build pipeline is C++ (libSLR/Accelerator/SBVH.h); the
TPU framework keeps the same split: one-time sequential scene-build work runs
in native code on the host, while the per-ray hot path is Pallas/XLA device
code. The shared library is compiled from the checked-in sources on first use
with the baked-in g++ toolchain and cached next to the sources; everything
has a pure-Python fallback so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["sbvh.cc"]
_LIB_PATH = os.path.join(_DIR, "libslr_native.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_lib() -> str | None:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    if os.path.exists(_LIB_PATH) and all(
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(s) for s in srcs
    ):
        return _LIB_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return _LIB_PATH


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _build_lib()
        if path is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.slr_sbvh_build.restype = ctypes.c_int
        lib.slr_sbvh_build.argtypes = [
            f32p, f32p, f32p, ctypes.c_int,          # p0, p1, p2, n
            ctypes.c_int, ctypes.c_float, ctypes.c_int,  # spatial, alpha, max_refs
            f32p, f32p, i32p, i32p, i32p,            # node arrays, prim_order
            i32p, f32p,                              # stats, sah_cost
            ctypes.c_void_p,                         # prim_cost (nullable)
        ]
        _lib = lib
    return _lib


class SBVHResult:
    def __init__(self, node_min, node_max, node_left, node_right, prim_order,
                 n_nodes, n_refs, depth, sah_cost, budget_hit):
        self.node_min = node_min
        self.node_max = node_max
        self.node_left = node_left
        self.node_right = node_right
        self.prim_order = prim_order
        self.n_nodes = n_nodes
        self.n_refs = n_refs
        self.depth = depth
        self.sah_cost = sah_cost
        self.budget_hit = budget_hit


def sbvh_build(
    p0: np.ndarray,
    p1: np.ndarray,
    p2: np.ndarray,
    spatial: bool = True,
    alpha: float = 1e-5,
    budget: float = 2.0,
    prim_cost: np.ndarray | None = None,
) -> SBVHResult | None:
    """Binned-SAH / spatial-split SBVH over triangles (Stich2009; reference
    libSLR/Accelerator/SBVH.h:57-348). Host-side one-time build. Returns None
    when the native library is unavailable or n < 2 (callers fall back to the
    Python LBVH builder)."""
    lib = get_lib()
    n = len(p0)
    if lib is None or n < 2:
        return None
    p0 = np.ascontiguousarray(p0, np.float32)
    p1 = np.ascontiguousarray(p1, np.float32)
    p2 = np.ascontiguousarray(p2, np.float32)
    max_refs = max(int(n * budget), n + 16)
    node_min = np.empty((max_refs, 3), np.float32)
    node_max = np.empty((max_refs, 3), np.float32)
    node_left = np.empty((max_refs,), np.int32)
    node_right = np.empty((max_refs,), np.int32)
    prim_order = np.empty((max_refs,), np.int32)
    stats = np.zeros((3,), np.int32)
    sah = np.zeros((1,), np.float32)
    pc = (None if prim_cost is None
          else np.ascontiguousarray(prim_cost, np.float32))
    rc = lib.slr_sbvh_build(
        p0, p1, p2, n, int(spatial), float(alpha), max_refs,
        node_min, node_max, node_left, node_right, prim_order, stats, sah,
        None if pc is None else pc.ctypes.data,
    )
    if rc == 2:
        return None
    nn, nr, depth = int(stats[0]), int(stats[1]), int(stats[2])
    return SBVHResult(
        node_min[:nn].copy(), node_max[:nn].copy(),
        node_left[:nn].copy(), node_right[:nn].copy(),
        prim_order[:nr].copy(), nn, nr, depth, float(sah[0]), rc == 1,
    )
