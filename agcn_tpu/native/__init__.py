"""Native host-side kernels (ctypes bindings to skelio.cpp in this package).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "skelio.cpp")


def _lib_path() -> str:
    """Build destination: next to the source when writable (dev repo),
    else a user cache dir (read-only site-packages installs)."""
    if os.access(_PKG_DIR, os.W_OK):
        return os.path.join(_PKG_DIR, "libskelio.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache", "agcn_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libskelio.so")


_LIB = _lib_path()

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off",
             "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                    os.path.getmtime(_SRC)
                                    > os.path.getmtime(_LIB)):
        if not (os.path.exists(_SRC) and _build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.parse_skeleton.restype = ctypes.c_int
        lib.parse_skeleton.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.flatten_persons.restype = ctypes.c_int
        lib.flatten_persons.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.pre_normalize.restype = None
        lib.pre_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int] * 10
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def parse_skeleton(path: str, max_body: int = 4, max_frames: int = 300,
                   num_joint: int = 25) -> Tuple[np.ndarray, int]:
    """Parse an NTU `.skeleton` file -> ((max_body, T, V, 3), num_frames).

    Native fast path; falls back to agcn_tpu.data.gen.ntu.read_skeleton.
    """
    lib = get_lib()
    if lib is not None:
        out = np.zeros((max_body, max_frames, num_joint, 3),
                       dtype=np.float32)
        frames = lib.parse_skeleton(
            path.encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            max_body, max_frames, num_joint)
        if frames >= 0:
            return out, int(frames)
    from agcn_tpu.data.gen.ntu import read_skeleton

    data, frames = read_skeleton(path)
    t = min(frames, max_frames)
    out = np.zeros((max_body, max_frames, num_joint, 3), dtype=np.float32)
    out[:, :t] = data[:max_body, :t]
    return out, t


def flatten_persons(seq: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, 2*half) -> interleaved (T', half) frames + (T', 1) subjects.

    Native fast path for SGN collation; numpy fallback mirrors
    agcn_tpu.data.sgn_collate.SegmentSampler.flatten_persons.
    """
    lib = get_lib()
    t, d = seq.shape
    half = d // 2
    if lib is not None:
        seq_c = np.ascontiguousarray(seq, dtype=np.float32)
        frames = np.empty((2 * t, half), dtype=np.float32)
        subjects = np.empty((2 * t,), dtype=np.float32)
        n = lib.flatten_persons(
            seq_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, half,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            subjects.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            2 * t)
        return frames[:n].copy(), subjects[:n, None].copy()
    from agcn_tpu.data.sgn_collate import SegmentSampler

    sampler = SegmentSampler()
    nz = seq.any(axis=-1)
    return sampler.flatten_persons(seq[nz])


def pre_normalize(data: np.ndarray,
                  zaxis=(0, 1), xaxis=(8, 4), pad: bool = True,
                  center: bool = True,
                  center_firstframe: bool = False) -> Optional[np.ndarray]:
    """Native pre_normalization over (N, C, T, V, M) float32 data.

    Returns the normalized copy, or None when the native library is
    unavailable (caller falls back to the numpy implementation in
    agcn_tpu.data.gen.preprocess).
    """
    lib = get_lib()
    if lib is None or data.shape[1] != 3:
        return None
    n, c, t, v, m = data.shape
    for pair in (zaxis, xaxis):
        # numpy wraps negative joint indices and raises on >= V; the C
        # sentinel for "skip" is -1, so route anything outside [0, V)
        # to the numpy path rather than silently diverge
        if pair is not None and any(j < 0 or j >= v for j in pair):
            return None
    s = np.ascontiguousarray(
        np.transpose(data, (0, 4, 2, 3, 1)), dtype=np.float32)
    z_from, z_to = (zaxis[0], zaxis[1]) if zaxis is not None else (-1, -1)
    # the x alignment swaps the pair (preprocess.py alignments table)
    x_from, x_to = (xaxis[1], xaxis[0]) if xaxis is not None else (-1, -1)
    center_mode = 1 if center else (2 if center_firstframe else 0)
    lib.pre_normalize(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, m, t, v, z_from, z_to, x_from, x_to,
        1 if pad else 0, center_mode)
    return np.transpose(s, (0, 4, 2, 3, 1))
