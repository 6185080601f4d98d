"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime is entirely native Rust — tobj OBJ ingestion
(mesh.rs:149-197) and SAH BVH construction (bvh.rs:24-120) run as compiled host
code at scene setup. This package is the framework's native equivalent: a small
C++ library (src/native.cpp) built on demand with the system toolchain and loaded
through ctypes (no pybind11 in this environment). Pure-Python fallbacks exist for
every entry point (io/obj.py, ops/bvh.py) and produce identical outputs; the
native path is the production one for large assets.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src", "native.cpp")
_LIB = os.path.join(_DIR, "src", "libtpupt_native.so")

_lib = None
_load_error: str | None = None


def _build_and_load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_num_vertices.restype = ctypes.c_int64
        lib.obj_num_vertices.argtypes = [ctypes.c_void_p]
        lib.obj_num_faces.restype = ctypes.c_int64
        lib.obj_num_faces.argtypes = [ctypes.c_void_p]
        lib.obj_has_normals.restype = ctypes.c_int
        lib.obj_has_normals.argtypes = [ctypes.c_void_p]
        lib.obj_has_uvs.restype = ctypes.c_int
        lib.obj_has_uvs.argtypes = [ctypes.c_void_p]
        lib.obj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
        lib.obj_free.argtypes = [ctypes.c_void_p]
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.bvh_build_sah.restype = ctypes.c_void_p
        lib.bvh_build_sah.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.bvh_num_nodes_sah.restype = ctypes.c_int64
        lib.bvh_num_nodes_sah.argtypes = [ctypes.c_void_p]
        lib.bvh_num_clusters.restype = ctypes.c_int64
        lib.bvh_num_clusters.argtypes = [ctypes.c_void_p]
        lib.bvh_copy_sah.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 10
        lib.bvh_free_sah.argtypes = [ctypes.c_void_p]
        lib.bvh_num_nodes.restype = ctypes.c_int64
        lib.bvh_num_nodes.argtypes = [ctypes.c_void_p]
        lib.bvh_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure -> Python fallback
        _load_error = f"{type(e).__name__}: {e}"
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def load_error() -> str | None:
    _build_and_load()
    return _load_error


def parse_obj(path: str):
    """Native OBJ parse -> same dict contract as io.obj.load_obj, or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    if not h:
        return None
    try:
        nv = lib.obj_num_vertices(h)
        nf = lib.obj_num_faces(h)
        pos = np.empty((nv, 3), np.float32)
        nrm = np.empty((nv, 3), np.float32)
        uv = np.empty((nv, 2), np.float32)
        idx = np.empty((nf, 3), np.int32)
        lib.obj_copy(
            h,
            pos.ctypes.data_as(ctypes.c_void_p),
            nrm.ctypes.data_as(ctypes.c_void_p),
            uv.ctypes.data_as(ctypes.c_void_p),
            idx.ctypes.data_as(ctypes.c_void_p),
        )
        return {
            "positions": pos,
            "normals": nrm if lib.obj_has_normals(h) else None,
            "uvs": uv if lib.obj_has_uvs(h) else None,
            "indices": idx,
        }
    finally:
        lib.obj_free(h)


def build_tri_bvh_sah(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Native binned-SAH build -> (order, nodes, clusters) like
    ops.bvh.build_tri_bvh_sah, or None to fall back to the numpy builder."""
    lib = _build_and_load()
    if lib is None or not hasattr(lib, "bvh_build_sah"):
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = v0.shape[0]
    h = lib.bvh_build_sah(
        v0.ctypes.data_as(ctypes.c_void_p),
        e1.ctypes.data_as(ctypes.c_void_p),
        e2.ctypes.data_as(ctypes.c_void_p),
        n,
    )
    if not h:
        return None
    try:
        m = lib.bvh_num_nodes_sah(h)
        c = lib.bvh_num_clusters(h)
        order = np.empty(n, np.int32)
        bmin = np.empty((m, 3), np.float32)
        bmax = np.empty((m, 3), np.float32)
        skip = np.empty(m, np.int32)
        start = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        cl_start = np.empty(c, np.int32)
        cl_count = np.empty(c, np.int32)
        cl_min = np.empty((c, 3), np.float32)
        cl_max = np.empty((c, 3), np.float32)
        lib.bvh_copy_sah(
            h,
            order.ctypes.data_as(ctypes.c_void_p),
            bmin.ctypes.data_as(ctypes.c_void_p),
            bmax.ctypes.data_as(ctypes.c_void_p),
            skip.ctypes.data_as(ctypes.c_void_p),
            start.ctypes.data_as(ctypes.c_void_p),
            count.ctypes.data_as(ctypes.c_void_p),
            cl_start.ctypes.data_as(ctypes.c_void_p),
            cl_count.ctypes.data_as(ctypes.c_void_p),
            cl_min.ctypes.data_as(ctypes.c_void_p),
            cl_max.ctypes.data_as(ctypes.c_void_p),
        )
        nodes = dict(bmin=bmin, bmax=bmax, skip=skip, start=start, count=count)
        clusters = dict(start=cl_start, count=cl_count, bmin=cl_min, bmax=cl_max)
        return order, nodes, clusters
    finally:
        lib.bvh_free_sah(h)


def build_tri_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Native BVH build -> (order, nodes dict) like ops.bvh.build_tri_bvh, or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = v0.shape[0]
    h = lib.bvh_build(
        v0.ctypes.data_as(ctypes.c_void_p),
        e1.ctypes.data_as(ctypes.c_void_p),
        e2.ctypes.data_as(ctypes.c_void_p),
        n,
    )
    if not h:
        return None
    try:
        m = lib.bvh_num_nodes(h)
        order = np.empty(n, np.int32)
        bmin = np.empty((m, 3), np.float32)
        bmax = np.empty((m, 3), np.float32)
        skip = np.empty(m, np.int32)
        start = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        lib.bvh_copy(
            h,
            order.ctypes.data_as(ctypes.c_void_p),
            bmin.ctypes.data_as(ctypes.c_void_p),
            bmax.ctypes.data_as(ctypes.c_void_p),
            skip.ctypes.data_as(ctypes.c_void_p),
            start.ctypes.data_as(ctypes.c_void_p),
            count.ctypes.data_as(ctypes.c_void_p),
        )
        return order, dict(bmin=bmin, bmax=bmax, skip=skip, start=start, count=count)
    finally:
        lib.bvh_free(h)
