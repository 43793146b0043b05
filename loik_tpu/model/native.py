"""ctypes bindings for the native C++ URDF parser (cpp/urdf_parser.cpp).

Builds the shared library on first use (g++, no external deps) and caches it
next to the source.  Falls back to the pure-Python parser transparently if
the toolchain is unavailable; `load_urdf_native` raises if parsing fails.
Cross-validated against the Python loader in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import jax.numpy as jnp
import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "liburdf_loik.so")
_SRC_PATH = os.path.join(_CPP_DIR, "urdf_parser.cpp")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC_PATH, "-o", _LIB_PATH],
        check=True,
        capture_output=True,
    )


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.loik_urdf_parse.restype = ctypes.c_int
            lib.loik_urdf_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.loik_urdf_error.restype = ctypes.c_char_p
            lib.loik_urdf_names.restype = ctypes.c_char_p
            lib.loik_urdf_get.restype = ctypes.c_int
            _lib = lib
    return _lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def load_urdf_native(source: str, name: str | None = None, dtype=jnp.float64,
                     floating_base: bool = False):
    """Parse a URDF string or file path with the native parser."""
    from .tree import (FREE_FLYER, PLANAR, PRISMATIC, REVOLUTE,
                       REVOLUTE_UNBOUNDED, SPHERICAL, TRANSLATION, UNIVERSAL,
                       KinematicTree)

    if "<robot" not in source:
        with open(source) as f:
            source = f.read()
    lib = get_lib()
    with _lock:
        n = lib.loik_urdf_parse(source.encode(), int(floating_base))
        if n == 0:
            raise ValueError(
                "native URDF parse failed: " + lib.loik_urdf_error().decode()
            )
        parents = np.zeros(n, np.int32)
        jtypes = np.zeros(n, np.int32)
        pR = np.zeros((n, 3, 3), np.float64)
        pp = np.zeros((n, 3), np.float64)
        axis = np.zeros((n, 3), np.float64)
        vel = np.zeros(n, np.float64)
        lib.loik_urdf_get(
            parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            jtypes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            pR.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            axis.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        names = tuple(lib.loik_urdf_names().decode().split("\n")[:n])
        axis2 = np.zeros((n, 3), np.float64)
        lib.loik_urdf_get_axis2(
            axis2.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )

    type_map = {0: REVOLUTE, 1: PRISMATIC, 2: FREE_FLYER, 3: SPHERICAL,
                4: REVOLUTE_UNBOUNDED, 5: TRANSLATION, 6: PLANAR,
                7: UNIVERSAL}
    from .tree import JOINT_NQ, JOINT_NV

    jt = tuple(type_map[int(t)] for t in jtypes)
    idx_v, idx_q = [], []
    nv = nq = 0
    for t in jt:
        idx_v.append(nv)
        idx_q.append(nq)
        nv += JOINT_NV[t]
        nq += JOINT_NQ[t]
    vel_full = np.full(nv, np.inf)
    for i, t in enumerate(jt):
        v = vel[i] if vel[i] < 1e29 else np.inf
        vel_full[idx_v[i] : idx_v[i] + JOINT_NV[t]] = v
    return KinematicTree(
        placement_R=jnp.asarray(pR, dtype),
        placement_p=jnp.asarray(pp, dtype),
        axis=jnp.asarray(axis, dtype),
        velocity_limit=jnp.asarray(vel_full, dtype),
        parents=tuple(int(p) for p in parents),
        jtypes=jt,
        idx_v=tuple(idx_v),
        idx_q=tuple(idx_q),
        joint_names=names,
        name=name or "robot",
        axis2=(jnp.asarray(axis2, dtype)
               if any(t == UNIVERSAL for t in jt) else None),
    )
