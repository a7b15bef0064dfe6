"""ctypes bindings for the native host-side packer (native/kitpack.cpp).

Builds the shared library on first use (g++, cached next to the source and
under ~/.cache as fallback) and falls back to numpy transparently when no
toolchain is available — the API contract is identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "kitpack.cpp")

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    candidates = [os.path.join(os.path.dirname(_SRC), "libkitpack.so"),
                  os.path.join(os.path.expanduser("~/.cache"),
                               "libkitpack.so")]
    lib_path = None
    for cand in candidates:
        if os.path.exists(cand) and \
                os.path.getmtime(cand) >= os.path.getmtime(_SRC):
            lib_path = cand
            break
        if _build(_SRC, cand):
            lib_path = cand
            break
    if lib_path is None:
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.kitpack_pad_videos.argtypes = [
        _F32P, _I64P, _I64P, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _F32P, _I32P]
    lib.kitpack_valid_mask.argtypes = [
        _I32P, ctypes.c_int64, ctypes.c_int64, _F32P]
    lib.kitpack_pad_with_sos.argtypes = [
        _F32P, _I64P, _I64P, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, _F32P, _I32P]
    lib.kitpack_abi_version.restype = ctypes.c_int64
    if lib.kitpack_abi_version() != 1:
        return None
    return lib


def native_available() -> bool:
    return _lib() is not None


def _concat(videos: Sequence[np.ndarray]):
    lengths = np.asarray([len(v) for v in videos], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    flat = np.concatenate(
        [np.ascontiguousarray(v, np.float32).reshape(len(v), -1)
         for v in videos]) if videos else np.zeros((0, 1), np.float32)
    return flat, offsets, lengths


def pad_videos_native(videos: Sequence[np.ndarray], t_pad: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(B, t_pad, K, C) padded batch + (B,) lengths; native when possible."""
    shape_tail = videos[0].shape[1:]
    frame_size = int(np.prod(shape_tail))
    n = len(videos)
    lib = _lib()
    if lib is None:
        out = np.zeros((n, t_pad) + tuple(shape_tail), np.float32)
        lens = np.zeros(n, np.int32)
        for i, v in enumerate(videos):
            t = min(len(v), t_pad)
            out[i, :t] = v[:t]
            lens[i] = t
        return out, lens
    flat, offsets, lengths = _concat(videos)
    out = np.empty((n, t_pad, frame_size), np.float32)
    lens = np.empty(n, np.int32)
    lib.kitpack_pad_videos(flat, offsets, lengths, n, t_pad, frame_size,
                           out, lens)
    return out.reshape((n, t_pad) + tuple(shape_tail)), lens


def pad_with_sos_native(videos: Sequence[np.ndarray], t_pad: int,
                        sos_value: float = 1.0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """(B, t_pad + 1, *tail) batch with a constant SOS frame prepended to
    each video (reference add_sos, dataloader.py:482-493), plus (B,)
    clamped lengths (SOS excluded).  Backs the precorrupted-batch assembly
    in data/pipeline.py at memcpy speed; numpy fallback otherwise."""
    shape_tail = videos[0].shape[1:]
    frame_size = int(np.prod(shape_tail))
    n = len(videos)
    lib = _lib()
    if lib is None:
        out = np.zeros((n, t_pad + 1) + tuple(shape_tail), np.float32)
        lens = np.zeros(n, np.int32)
        out[:, 0] = sos_value
        for i, v in enumerate(videos):
            t = min(len(v), t_pad)
            out[i, 1:t + 1] = v[:t]
            lens[i] = t
        return out, lens
    flat, offsets, lengths = _concat(videos)
    out = np.empty((n, t_pad + 1, frame_size), np.float32)
    lens = np.empty(n, np.int32)
    lib.kitpack_pad_with_sos(flat, offsets, lengths, n, t_pad, frame_size,
                             np.float32(sos_value), out, lens)
    return out.reshape((n, t_pad + 1) + tuple(shape_tail)), lens


def valid_mask_native(lengths: np.ndarray, t_pad: int) -> np.ndarray:
    lengths = np.ascontiguousarray(lengths, np.int32)
    lib = _lib()
    if lib is None:
        return (np.arange(t_pad)[None, :] <
                lengths[:, None]).astype(np.float32)
    out = np.empty((len(lengths), t_pad), np.float32)
    lib.kitpack_valid_mask(lengths, len(lengths), t_pad, out)
    return out
