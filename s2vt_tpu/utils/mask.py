"""RLE mask API — pycocotools.mask-compatible, backed by C++.

The reference vendors pycocotools with a Cython ``_mask`` extension whose C
source is absent (/root/reference/coco_caption/pycocotools/_mask.pyx) and
which nothing on the caption path imports (SURVEY.md §2 #23). This module
provides the used API surface over ``native/s2vt_mask.cpp``:

    encode(mask) / decode(rle) / area(rle) / merge(rles, intersect)
    iou(dt, gt, iscrowd) / toBbox(rle) / frBbox(bbox, h, w)

RLE objects are dicts {'size': [h, w], 'counts': np.uint32 array}, the
uncompressed form of the COCO convention (column-major, starts with a
zero-run).
"""

from __future__ import annotations

import ctypes
import threading
import pathlib
from typing import Dict, List, Sequence

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent.parent / "native" / "s2vt_mask.cpp"
_LOCK = threading.Lock()
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        from s2vt_tpu.data.native_loader import build_lib
        out = build_lib(_SRC, "libs2vt_mask.so")
        lib = ctypes.CDLL(str(out))
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.rle_encode.restype = ctypes.c_long
        lib.rle_encode.argtypes = [u8p, ctypes.c_long, ctypes.c_long, u32p,
                                   ctypes.c_long]
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [u32p, ctypes.c_long, ctypes.c_long,
                                   ctypes.c_long, u8p]
        lib.rle_area.restype = ctypes.c_long
        lib.rle_area.argtypes = [u32p, ctypes.c_long]
        lib.rle_merge.restype = ctypes.c_long
        lib.rle_merge.argtypes = [u32p, ctypes.c_long, u32p, ctypes.c_long,
                                  ctypes.c_int, u32p, ctypes.c_long]
        lib.rle_iou.restype = ctypes.c_double
        lib.rle_iou.argtypes = [u32p, ctypes.c_long, u32p, ctypes.c_long,
                                ctypes.c_int]
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_long, dp]
        lib.bb_iou.restype = ctypes.c_double
        lib.bb_iou.argtypes = [dp, dp, ctypes.c_int]
        _LIB = lib
    return _LIB


def _u32(a):
    return np.ascontiguousarray(a, np.uint32)


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def encode(mask: np.ndarray) -> Dict:
    """Binary mask [h, w] -> RLE (column-major runs)."""
    h, w = mask.shape
    flat = np.ascontiguousarray(mask.T.reshape(-1), np.uint8)  # col-major
    out = np.zeros(h * w + 2, np.uint32)
    n = _load().rle_encode(_ptr(flat, ctypes.c_uint8), h, w,
                           _ptr(out, ctypes.c_uint32), len(out))
    assert n > 0
    return {"size": [h, w], "counts": out[:n].copy()}


def decode(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = _u32(rle["counts"])
    out = np.zeros(h * w, np.uint8)
    rc = _load().rle_decode(_ptr(counts, ctypes.c_uint32), len(counts), h, w,
                            _ptr(out, ctypes.c_uint8))
    if rc != 0:
        raise ValueError("invalid RLE")
    return out.reshape(w, h).T  # back to row-major [h, w]


def area(rle: Dict) -> int:
    counts = _u32(rle["counts"])
    return int(_load().rle_area(_ptr(counts, ctypes.c_uint32), len(counts)))


def merge(rles: Sequence[Dict], intersect: bool = False) -> Dict:
    assert rles, "merge of zero masks"
    acc = _u32(rles[0]["counts"])
    size = rles[0]["size"]
    lib = _load()
    for r in rles[1:]:
        b = _u32(r["counts"])
        out = np.zeros(len(acc) + len(b) + 2, np.uint32)
        n = lib.rle_merge(_ptr(acc, ctypes.c_uint32), len(acc),
                          _ptr(b, ctypes.c_uint32), len(b),
                          1 if intersect else 0,
                          _ptr(out, ctypes.c_uint32), len(out))
        assert n > 0
        acc = out[:n].copy()
    return {"size": size, "counts": acc}


def iou(dt: List[Dict], gt: List[Dict], iscrowd: Sequence[int]) -> np.ndarray:
    """Pairwise IoU matrix [len(dt), len(gt)] (RLE form)."""
    lib = _load()
    out = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        dc = _u32(d["counts"])
        for j, g in enumerate(gt):
            gc = _u32(g["counts"])
            out[i, j] = lib.rle_iou(
                _ptr(dc, ctypes.c_uint32), len(dc),
                _ptr(gc, ctypes.c_uint32), len(gc),
                int(iscrowd[j]) if j < len(iscrowd) else 0)
    return out


def bbox_iou(dt: np.ndarray, gt: np.ndarray,
             iscrowd: Sequence[int]) -> np.ndarray:
    """Pairwise IoU of [x, y, w, h] boxes."""
    lib = _load()
    dt = np.ascontiguousarray(dt, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    out = np.zeros((len(dt), len(gt)))
    for i in range(len(dt)):
        for j in range(len(gt)):
            out[i, j] = lib.bb_iou(
                _ptr(dt[i], ctypes.c_double), _ptr(gt[j], ctypes.c_double),
                int(iscrowd[j]) if j < len(iscrowd) else 0)
    return out


def toBbox(rle: Dict) -> np.ndarray:
    counts = _u32(rle["counts"])
    out = np.zeros(4, np.float64)
    _load().rle_to_bbox(_ptr(counts, ctypes.c_uint32), len(counts),
                        rle["size"][0], rle["size"][1],
                        _ptr(out, ctypes.c_double))
    return out


def frBbox(bbox: Sequence[float], h: int, w: int) -> Dict:
    """[x, y, w, h] -> RLE of the filled box."""
    x, y, bw, bh = (int(round(v)) for v in bbox)
    mask = np.zeros((h, w), np.uint8)
    mask[max(y, 0):min(y + bh, h), max(x, 0):min(x + bw, w)] = 1
    return encode(mask)


def _load_ext():
    lib = _load()
    if not hasattr(lib, "_ext_ready"):
        lib.rle_to_string.restype = ctypes.c_long
        lib.rle_to_string.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                      ctypes.c_long, ctypes.c_char_p,
                                      ctypes.c_long]
        lib.rle_from_string.restype = ctypes.c_long
        lib.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                        ctypes.POINTER(ctypes.c_uint32),
                                        ctypes.c_long]
        lib.poly_to_mask.argtypes = [ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_long, ctypes.c_long,
                                     ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_uint8)]
        lib._ext_ready = True
    return lib


def toString(rle: Dict) -> bytes:
    """Counts -> COCO compressed RLE string (pycocotools rleToString:
    LEB128 base-48 with delta coding from the second-previous count)."""
    lib = _load_ext()
    counts = _u32(rle["counts"])
    # worst case 7 base-48 chars per count (30 signed bits per 6 chars)
    buf = ctypes.create_string_buffer(7 * max(len(counts), 1) + 8)
    n = lib.rle_to_string(_ptr(counts, ctypes.c_uint32), len(counts), buf,
                          len(buf))
    if n < 0:
        raise ValueError("RLE string encoding overflow")
    return buf.raw[:n]


def frString(s: bytes, h: int, w: int) -> Dict:
    """COCO compressed RLE string -> counts RLE."""
    lib = _load_ext()
    out = np.zeros(max(len(s), 1) + 2, np.uint32)
    n = lib.rle_from_string(s, len(s), _ptr(out, ctypes.c_uint32), len(out))
    if n < 0:
        raise ValueError("invalid RLE string")
    return {"size": [h, w], "counts": out[:n].copy()}


def frUncompressedRLE(rle: Dict) -> Dict:
    """COCO 'uncompressed RLE' ({'counts': list, 'size': [h, w]}) -> the
    counts-array RLE used by this module."""
    h, w = rle["size"]
    return {"size": [h, w], "counts": _u32(rle["counts"])}


def frPyObjects(pyobj, h: int, w: int):
    """pycocotools.mask.frPyObjects dispatcher (reference mask.py:76-96):
    polygons (list of float lists), an [N, 4] bbox array, a single polygon,
    or an uncompressed-RLE dict -> RLE(s). Lists map elementwise."""
    if isinstance(pyobj, np.ndarray) and pyobj.ndim == 2:
        return [frBbox(b, h, w) for b in pyobj]
    if isinstance(pyobj, dict) and "counts" in pyobj:
        return frUncompressedRLE(pyobj)
    if isinstance(pyobj, (list, tuple)):
        if len(pyobj) == 0:
            return []
        first = pyobj[0]
        if isinstance(first, dict):
            return [frUncompressedRLE(o) for o in pyobj]
        if isinstance(first, (list, tuple, np.ndarray)):
            out = []
            for o in pyobj:
                o = np.asarray(o, np.float64).reshape(-1)
                out.append(frBbox(o, h, w) if o.size == 4
                           else frPoly([o], h, w))
            return out
        arr = np.asarray(pyobj, np.float64).reshape(-1)
        return frBbox(arr, h, w) if arr.size == 4 else frPoly([arr], h, w)
    raise TypeError(f"unsupported segmentation object {type(pyobj)!r}")


def frPoly(polys: Sequence[Sequence[float]], h: int, w: int) -> Dict:
    """Polygon(s) [x0,y0,x1,y1,...] -> RLE (union of filled polygons,
    even-odd scanline rasterization)."""
    lib = _load_ext()
    if not polys:  # empty segmentation -> empty mask
        return {"size": [h, w], "counts": np.asarray([h * w], np.uint32)}
    rles = []
    for poly in polys:
        xy = np.ascontiguousarray(poly, np.float64)
        assert xy.size % 2 == 0 and xy.size >= 6, "need >= 3 xy points"
        out = np.zeros(h * w, np.uint8)
        lib.poly_to_mask(_ptr(xy, ctypes.c_double), xy.size // 2, h, w,
                         _ptr(out, ctypes.c_uint8))
        rles.append(encode(out.reshape(h, w)))
    return merge(rles) if len(rles) > 1 else rles[0]
