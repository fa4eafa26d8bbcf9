"""Build + load the native vec-MuJoCo engine (ctypes; pybind11-free).

Compiles ``vec_mujoco.cc`` against the mujoco wheel's bundled headers and
``libmujoco.so`` on first use, caching the artifact under ``_build/`` keyed by
source mtime. Raises ImportError with a clear message when mujoco or a C++
toolchain is unavailable (callers gate on this and fall back to the pure
Python host loop).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "vec_mujoco.cc"
_BUILD = _HERE / "_build"

_lib = None


def _mujoco_paths():
    import mujoco

    pkg = pathlib.Path(mujoco.__file__).resolve().parent
    include = pkg / "include"
    sos = sorted(pkg.glob("libmujoco.so*"))
    if not include.is_dir() or not sos:
        raise ImportError(f"mujoco wheel at {pkg} lacks headers or libmujoco")
    return include, sos[-1]


def build() -> pathlib.Path:
    include, libmujoco = _mujoco_paths()
    _BUILD.mkdir(exist_ok=True)
    out = _BUILD / "libvecmj.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include}", str(_SRC), str(libmujoco),
        f"-Wl,-rpath,{libmujoco.parent}", "-o", str(out),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise ImportError(f"native vec_mujoco build failed:\n{proc.stderr}")
    return out


def load() -> ctypes.CDLL:
    """Compile if needed and return the ctypes handle with typed signatures."""
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build()))
    lib.vmj_create.restype = ctypes.c_void_p
    lib.vmj_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    for name in ("vmj_nq", "vmj_nv", "vmj_nu"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p]
    lib.vmj_timestep.restype = ctypes.c_double
    lib.vmj_timestep.argtypes = [ctypes.c_void_p]
    dp = ctypes.POINTER(ctypes.c_double)
    lib.vmj_qpos0.restype = None
    lib.vmj_qpos0.argtypes = [ctypes.c_void_p, dp]
    lib.vmj_set_state.restype = None
    lib.vmj_set_state.argtypes = [ctypes.c_void_p, ctypes.c_int, dp, dp]
    lib.vmj_get_state.restype = None
    lib.vmj_get_state.argtypes = [ctypes.c_void_p, dp, dp]
    lib.vmj_step.restype = None
    lib.vmj_step.argtypes = [ctypes.c_void_p, dp, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_ubyte)]
    lib.vmj_destroy.restype = None
    lib.vmj_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib
