"""ctypes bindings for the native CPU reference engine (liboracle.so).

The native engine plays the reference's "CPU twin" role (smallptCPU.cpp,
raytracer_non_OpenCL.c): a fast scalar implementation of the same
integrator semantics used for parity testing and as a host-side fallback
renderer. Built lazily with g++ on first use (no pybind11 in this image —
plain C ABI + ctypes per the environment constraints).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liboracle.so")
_SRC = os.path.join(_DIR, "oracle.cpp")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2", "-fPIC", "-shared", "-fopenmp", "-Wall", "-ffp-contract=off",
        "-o", _SO, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.se195_pt_render.argtypes = [
        f32p, f32p, f32p, f32p, i32p, ctypes.c_int,  # scene
        f32p, f32p,  # camera orig/target
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # w h spp start
        ctypes.c_int, ctypes.c_int,  # direct_only max_depth
        u32p, f32p,
    ]
    lib.se195_pt_render.restype = None
    lib.se195_camera_basis.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, f32p]
    lib.se195_camera_basis.restype = None
    lib.se195_bmp_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.se195_bmp_encode.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_render(
    scene,
    camera_orig,
    camera_target,
    width: int,
    height: int,
    spp: int,
    seeds: np.ndarray,
    direct_only: bool = False,
    max_depth: int = 7,
    sample_start: int = 0,
    accum: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render with the native engine.

    ``seeds``: uint32 [H, W, 2], mutated in place (stream state advances).
    Returns (image [H, W, 3] float32, seeds).
    """
    lib = load()
    center = np.ascontiguousarray(np.asarray(scene.center, np.float32))
    radius = np.ascontiguousarray(np.asarray(scene.radius, np.float32))
    emission = np.ascontiguousarray(np.asarray(scene.emission, np.float32))
    color = np.ascontiguousarray(np.asarray(scene.color, np.float32))
    refl = np.ascontiguousarray(np.asarray(scene.refl, np.int32))
    co = np.ascontiguousarray(np.asarray(camera_orig, np.float32))
    ct = np.ascontiguousarray(np.asarray(camera_target, np.float32))
    seeds = np.ascontiguousarray(seeds, np.uint32)
    out = (
        np.zeros((height, width, 3), np.float32)
        if accum is None
        else np.ascontiguousarray(accum, np.float32)
    )
    lib.se195_pt_render(
        _fp(center), _fp(radius), _fp(emission), _fp(color),
        refl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(radius.shape[0]),
        _fp(co), _fp(ct),
        int(width), int(height), int(spp), int(sample_start),
        int(bool(direct_only)), int(max_depth),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _fp(out),
    )
    return out, seeds


def native_bmp_bytes(img_u8: np.ndarray) -> bytes:
    lib = load()
    h, w, _ = img_u8.shape
    img = np.ascontiguousarray(img_u8, np.uint8)
    buf = np.zeros(54 + h * (3 * w + 3), np.uint8)
    n = lib.se195_bmp_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(w), int(h),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return bytes(buf[:n])
