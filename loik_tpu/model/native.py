"""ctypes bindings for the native C++ URDF parser (cpp/urdf_parser.cpp).

Builds the shared library on first use (g++, no external deps) and caches it
next to the source.  Falls back to the pure-Python parser transparently if
the toolchain is unavailable; `load_urdf_native` raises if parsing fails.
Feature parity with `load_urdf` — same joint-type coverage (including the
helical / spherical_zyx extensions) and the same mimic policy
(reject-by-default / mimic='reduce' folding into MIMIC_PAIR joints) — is
cross-validated against the Python loader in tests/test_native.py.
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
            lib.loik_urdf_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.loik_urdf_error.restype = ctypes.c_char_p
            lib.loik_urdf_names.restype = ctypes.c_char_p
            lib.loik_urdf_get.restype = ctypes.c_int
            lib.loik_urdf_get_extras.restype = ctypes.c_int
            _lib = lib
    return _lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def load_urdf_native(source: str, name: str | None = None, dtype=jnp.float64,
                     floating_base: bool = False, mimic: str = "raise"):
    """Parse a URDF string or file path with the native parser.

    Same surface as `load_urdf`: mimic="raise" (default) rejects <mimic>
    couplings; mimic="reduce" folds serial-adjacent pairs into MIMIC_PAIR
    joints (the folding runs natively, cpp/urdf_parser.cpp)."""
    from .tree import (FREE_FLYER, HELICAL, MIMIC_PAIR, PLANAR, PRISMATIC,
                       REVOLUTE, REVOLUTE_UNBOUNDED, SPHERICAL,
                       SPHERICAL_ZYX, TRANSLATION, UNIVERSAL, KinematicTree)

    if mimic not in ("raise", "reduce"):
        raise ValueError(f"mimic must be 'raise' or 'reduce'; got {mimic!r}")
    if "<robot" not in source:
        with open(source) as f:
            source = f.read()
    lib = get_lib()
    with _lock:
        n = lib.loik_urdf_parse(source.encode(), int(floating_base),
                                int(mimic == "reduce"))
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

        def _d(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

        lib.loik_urdf_get(
            parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            jtypes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            _d(pR), _d(pp), _d(axis), _d(vel),
        )
        names = tuple(lib.loik_urdf_names().decode().split("\n")[:n])
        axis2 = np.zeros((n, 3), np.float64)
        lib.loik_urdf_get_axis2(_d(axis2))
        pitch = np.zeros(n, np.float64)
        mimic_meta = np.zeros((n, 4), np.float64)
        p2R = np.zeros((n, 3, 3), np.float64)
        p2p = np.zeros((n, 3), np.float64)
        lib.loik_urdf_get_extras(_d(pitch), _d(mimic_meta), _d(p2R), _d(p2p))

    type_map = {0: REVOLUTE, 1: PRISMATIC, 2: FREE_FLYER, 3: SPHERICAL,
                4: REVOLUTE_UNBOUNDED, 5: TRANSLATION, 6: PLANAR,
                7: UNIVERSAL, 8: HELICAL, 9: SPHERICAL_ZYX, 10: MIMIC_PAIR}
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
    has_mimic = any(t == MIMIC_PAIR for t in jt)
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
               if any(t in (UNIVERSAL, MIMIC_PAIR) for t in jt) else None),
        pitches=(tuple(float(h) for h in pitch)
                 if any(t == HELICAL for t in jt) else None),
        mimic=(tuple(
            (int(m[0]), int(m[1]), float(m[2]), float(m[3]))
            if t == MIMIC_PAIR else None
            for t, m in zip(jt, mimic_meta)
        ) if has_mimic else None),
        placement2_R=jnp.asarray(p2R, dtype) if has_mimic else None,
        placement2_p=jnp.asarray(p2p, dtype) if has_mimic else None,
    )
