"""ctypes bindings for the native host components, with numpy fallbacks.

pybind11 is not available in this image; the ABI is plain C (extern "C")
loaded via ctypes. Every entry point has a pure-numpy fallback so the package
works without a compiler — the native path is an optimization of host-side
work, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


@functools.cache
def _load(name: str) -> Optional[ctypes.CDLL]:
    path = os.path.join(_HERE, name)
    if not os.path.exists(path):
        from sfmfromscratch_tpu.native.build import build

        if not build():
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def native_available() -> bool:
    return _load("libsfmpre.so") is not None and _load("libsfmtrack.so") is not None


# ----------------------------------------------------------------- preprocess

def resize_gray(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """uint8 RGB/gray image -> resized float32 [0,1] grayscale, single fused
    native pass (fallback: numpy). Bilinear, half-pixel centers."""
    oh, ow = out_hw
    lib = _load("libsfmpre.so")
    if lib is not None and img.dtype == np.uint8:
        img = np.ascontiguousarray(img)
        out = np.empty((oh, ow), dtype=np.float32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        if img.ndim == 3 and img.shape[2] == 3:
            lib.resize_gray_u8(
                img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
                out.ctypes.data_as(f32p), oh, ow,
            )
            return out
        if img.ndim == 2:
            lib.resize_gray1_u8(
                img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
                out.ctypes.data_as(f32p), oh, ow,
            )
            return out
    # Fallback: numpy bilinear (same convention).
    return _resize_gray_numpy(img, out_hw)


def _resize_gray_numpy(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    f = img.astype(np.float32)
    if f.ndim == 3:
        f = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    if img.dtype == np.uint8:
        f = f / 255.0
    h, w = f.shape
    oh, ow = out_hw
    fy = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    fx = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None]
    wx = np.clip(fx - x0, 0, 1)[None, :]
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


# ----------------------------------------------------------------- trackgraph

def build_tracks(
    edges_a: np.ndarray, edges_b: np.ndarray, num_nodes: int,
    node_image: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int, Optional[np.ndarray]]:
    """Connected-component track ids from match edges (union-find).

    Nodes are (image, keypoint) slots flattened image-major. Returns
    (track_id_per_node, num_tracks, track_valid_or_None). When ``node_image``
    is given (image id per node, image-major ordered), tracks observed twice in
    one image are flagged invalid — the standard track-consistency rule.
    """
    ea = np.ascontiguousarray(edges_a, dtype=np.int64)
    eb = np.ascontiguousarray(edges_b, dtype=np.int64)
    n = int(num_nodes)
    lib = _load("libsfmtrack.so")
    i64p = ctypes.POINTER(ctypes.c_int64)
    if lib is not None:
        parent = np.empty(n, dtype=np.int64)
        out = np.empty(n, dtype=np.int64)
        lib.build_tracks.restype = ctypes.c_int64
        num_tracks = int(
            lib.build_tracks(
                ea.ctypes.data_as(i64p), eb.ctypes.data_as(i64p),
                ctypes.c_int64(len(ea)), ctypes.c_int64(n),
                parent.ctypes.data_as(i64p), out.ctypes.data_as(i64p),
            )
        )
        valid = None
        if node_image is not None:
            ni = np.ascontiguousarray(node_image, dtype=np.int64)
            valid = np.empty(num_tracks, dtype=np.int64)
            scratch = np.empty(num_tracks, dtype=np.int64)
            lib.filter_duplicate_image_tracks(
                ni.ctypes.data_as(i64p), out.ctypes.data_as(i64p),
                ctypes.c_int64(n), ctypes.c_int64(num_tracks),
                valid.ctypes.data_as(i64p), scratch.ctypes.data_as(i64p),
            )
            valid = valid.astype(bool)
        return out, num_tracks, valid

    # numpy fallback union-find
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(ea, eb):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    out = np.full(n, -1, dtype=np.int64)
    num_tracks = 0
    root_id = {}
    for i in range(n):
        r = find(i)
        if r not in root_id:
            root_id[r] = num_tracks
            num_tracks += 1
        out[i] = root_id[r]
    valid = None
    if node_image is not None:
        valid = np.ones(num_tracks, dtype=bool)
        last_img = np.full(num_tracks, -1, dtype=np.int64)
        for i in range(n):
            t = out[i]
            if last_img[t] == node_image[i]:
                valid[t] = False
            else:
                last_img[t] = node_image[i]
    return out, num_tracks, valid
