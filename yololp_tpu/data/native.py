"""ctypes bindings for the native batch preprocessing library.

Falls back to cv2 in python when native/preproc/libyololp_preproc.so hasn't
been built (`make -C native/preproc`). The native path decodes + letterboxes
a whole batch across C++ threads in one call — no GIL, no worker processes.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "preproc", "libyololp_preproc.so")

_lib = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.isfile(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.yololp_decode_letterbox_batch.restype = ctypes.c_int
        lib.yololp_decode_letterbox_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None


def decode_letterbox_batch(jpeg_buffers: List[bytes], size: int,
                           num_threads: int = 0, scaleup: bool = True
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode+letterbox a batch of encoded images.

    scaleup=False caps the resize ratio at 1 (the VAL protocol — small
    images are padded, never upscaled); True matches the infer protocol.
    Returns (images (n, size, size, 3) RGB uint8, ratios, pads_w, pads_h).
    """
    n = len(jpeg_buffers)
    lib = load_native()
    if lib is None:
        return _cv2_fallback(jpeg_buffers, size, scaleup)

    blob = b"".join(jpeg_buffers)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in jpeg_buffers], out=offsets[1:])
    blob_arr = np.frombuffer(blob, np.uint8)
    out = np.empty((n, size, size, 3), np.uint8)
    ratios = np.empty(n, np.float32)
    pads_w = np.empty(n, np.float32)
    pads_h = np.empty(n, np.float32)
    n_ok = lib.yololp_decode_letterbox_batch(
        blob_arr.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, size, int(scaleup), num_threads,
        out.ctypes.data_as(ctypes.c_void_p),
        ratios.ctypes.data_as(ctypes.c_void_p),
        pads_w.ctypes.data_as(ctypes.c_void_p),
        pads_h.ctypes.data_as(ctypes.c_void_p))
    if n_ok < n:
        import warnings

        warnings.warn(f"native preproc: {n - n_ok}/{n} images failed to decode")
    return out, ratios, pads_w, pads_h


def _cv2_fallback(jpeg_buffers, size, scaleup=True):
    import cv2

    from yololp_tpu.data.images import letterbox

    n = len(jpeg_buffers)
    out = np.full((n, size, size, 3), 114, np.uint8)
    ratios = np.ones(n, np.float32)
    pads_w = np.zeros(n, np.float32)
    pads_h = np.zeros(n, np.float32)
    for i, buf in enumerate(jpeg_buffers):
        bgr = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        boxed, r, (dw, dh) = letterbox(bgr, size, auto=False, scaleup=scaleup)
        out[i] = boxed[..., ::-1]
        ratios[i], pads_w[i], pads_h[i] = r, dw, dh
    return out, ratios, pads_w, pads_h
