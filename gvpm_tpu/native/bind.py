"""ctypes bindings for the native host library (host_ops.cpp).

Builds libgvpmhost.so on first use (g++ is in the image; pybind11 is
not, hence ctypes). Everything degrades gracefully to the pure-python
paths when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgvpmhost.so")
_LIB = None
_TRIED = False


class _ObjMesh(ctypes.Structure):
    _fields_ = [("verts", ctypes.POINTER(ctypes.c_float)),
                ("normals", ctypes.POINTER(ctypes.c_float)),
                ("faces", ctypes.POINTER(ctypes.c_int64)),
                ("n_verts", ctypes.c_int64),
                ("n_faces", ctypes.c_int64),
                ("has_normals", ctypes.c_int)]


class _BvhNode(ctypes.Structure):
    _fields_ = [("lo", ctypes.c_float * 3), ("hi", ctypes.c_float * 3),
                ("left", ctypes.c_int32), ("right", ctypes.c_int32),
                ("first", ctypes.c_int32), ("count", ctypes.c_int32)]


class _Bvh(ctypes.Structure):
    _fields_ = [("nodes", ctypes.POINTER(_BvhNode)),
                ("order", ctypes.POINTER(ctypes.c_int32)),
                ("n_nodes", ctypes.c_int32), ("n_prims", ctypes.c_int32)]


def _build():
    src = os.path.join(_HERE, "host_ops.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
           "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(
                                           os.path.join(_HERE,
                                                        "host_ops.cpp"))):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.gv_load_obj.restype = ctypes.POINTER(_ObjMesh)
        lib.gv_load_obj.argtypes = [ctypes.c_char_p]
        lib.gv_free_obj.argtypes = [ctypes.POINTER(_ObjMesh)]
        lib.gv_build_bvh.restype = ctypes.POINTER(_Bvh)
        lib.gv_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32]
        lib.gv_free_bvh.argtypes = [ctypes.POINTER(_Bvh)]
        lib.gv_morton_sort.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available():
    return _load() is not None


def load_obj(path):
    """Fast OBJ parse -> (verts [V,3] f32, faces [F,3] i64, vn|None)."""
    lib = _load()
    m = lib.gv_load_obj(path.encode())
    if not m:
        raise IOError(f"cannot open {path}")
    try:
        mm = m.contents
        v = np.ctypeslib.as_array(mm.verts,
                                  (mm.n_verts, 3)).copy()
        f = np.ctypeslib.as_array(mm.faces, (mm.n_faces, 3)).copy()
        vn = None
        if mm.has_normals:
            vn = np.ctypeslib.as_array(mm.normals,
                                       (mm.n_verts, 3)).copy()
        return v, f, vn
    finally:
        lib.gv_free_obj(m)


def build_bvh(tri_lo, tri_hi, leaf_size=4):
    """Binned-SAH BVH -> dict of flat numpy arrays.

    Returns {node_lo [N,3], node_hi [N,3], left [N], right [N],
    first [N], count [N], order [P]} with left-child indices, -1 = leaf.
    """
    lib = _load()
    lo = np.ascontiguousarray(tri_lo, np.float32)
    hi = np.ascontiguousarray(tri_hi, np.float32)
    n = lo.shape[0]
    b = lib.gv_build_bvh(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, leaf_size)
    try:
        bb = b.contents
        nn = bb.n_nodes
        raw = np.ctypeslib.as_array(
            ctypes.cast(bb.nodes,
                        ctypes.POINTER(ctypes.c_float)), (nn, 10)).copy()
        as_int = raw.view(np.int32)
        out = dict(
            node_lo=raw[:, 0:3].copy(), node_hi=raw[:, 3:6].copy(),
            left=as_int[:, 6].copy(), right=as_int[:, 7].copy(),
            first=as_int[:, 8].copy(), count=as_int[:, 9].copy(),
            order=np.ctypeslib.as_array(bb.order, (bb.n_prims,)).copy())
        return out
    finally:
        lib.gv_free_bvh(b)


def morton_order(points, lo, hi):
    """Morton-code permutation of points [P,3]."""
    lib = _load()
    p = np.ascontiguousarray(points, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    out = np.empty(p.shape[0], np.int32)
    lib.gv_morton_sort(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), p.shape[0],
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
