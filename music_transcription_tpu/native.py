"""ctypes bindings for the native hostkit (native/hostkit.cpp).

Builds ``libhostkit.so`` on demand with the system C++ compiler (cached by
source mtime) and exposes:

  * ``decode_wav(path, start_frame, n_frames)`` -> float32 mono samples
  * ``wav_info(path)`` -> (format, channels, sample_rate, bits, n_frames)
  * ``fill_roll(pitches, starts, ends, velocities, fs, n_cols)`` -> (128, T)

``available()`` gates every use; callers keep a pure-Python fallback, so a
missing compiler degrades gracefully (and the Python paths remain the parity
oracle in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "hostkit.cpp")
_SO = os.path.join(_NATIVE_DIR, "libhostkit.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("format", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("sample_rate", ctypes.c_int32),
        ("bits", ctypes.c_int32),
        ("data_offset", ctypes.c_int64),
        ("n_frames", ctypes.c_int64),
    ]


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    tmp = f"{_SO}.tmp.{os.getpid()}"  # per-process tmp: concurrent builds race safely
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)  # atomic; last writer wins with identical content
            return True
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("MT_DISABLE_NATIVE"):
            return None
        try:
            if not _build():
                return None
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.mt_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.mt_wav_info.restype = ctypes.c_int
        lib.mt_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mt_decode_wav.restype = ctypes.c_int64
        lib.mt_fill_roll.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_double, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.mt_fill_roll.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def wav_info(path):
    lib = _load()
    info = _WavInfo()
    rc = lib.mt_wav_info(str(path).encode(), ctypes.byref(info))
    if rc != 0:
        raise ValueError(f"hostkit: cannot parse {path} (rc={rc})")
    return info


def decode_wav(path, start_frame: int = 0, n_frames: int | None = None) -> np.ndarray:
    """float32 mono samples for the window; raises on unsupported encodings."""
    lib = _load()
    if n_frames is None:
        n_frames = wav_info(path).n_frames - start_frame
    out = np.empty(max(0, int(n_frames)), np.float32)
    if out.size == 0:
        return out
    got = lib.mt_decode_wav(
        str(path).encode(), int(start_frame), int(n_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        raise ValueError(f"hostkit: decode failed for {path} (rc={got})")
    return out[:got]


def fill_roll(pitches, starts, ends, velocities, fs: float, n_cols: int) -> np.ndarray:
    lib = _load()
    pitches = np.ascontiguousarray(pitches, np.int32)
    starts = np.ascontiguousarray(starts, np.float64)
    ends = np.ascontiguousarray(ends, np.float64)
    velocities = np.ascontiguousarray(velocities, np.int32)
    roll = np.zeros((128, int(n_cols)), np.float64)
    lib.mt_fill_roll(len(pitches), pitches, starts, ends, velocities,
                     float(fs), int(n_cols), roll)
    return roll
