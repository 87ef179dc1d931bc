"""COCO RLE mask codec + polygon rasterization (numpy/cv2, no pycocotools).

The reference transports masks as COCO compressed RLE (reference:
mmdet/core/mask/utils.py:encode_mask_results via pycocotools.mask.encode;
structures.py:polygon_to_bitmap via frPyObjects+decode). pycocotools is not
available in this environment, so the codec is implemented natively from the
COCO format: column-major run lengths, LEB128-style 6-bit varint string with
second-order deltas.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

# native C kernels (dynamask_tpu/native/maskc.c — the reference's
# pycocotools-C equivalent); None -> the numpy paths below
try:
    from ..native import maskc as _maskc
except Exception:  # pragma: no cover — import must never break the codec
    _maskc = None


def _as_bytes(counts) -> bytes:
    return counts.encode('ascii') if isinstance(counts, str) else counts


def mask_to_rle_counts(mask: np.ndarray) -> np.ndarray:
    """Binary (h, w) mask -> run lengths (column-major, starting with 0s)."""
    flat = np.asarray(mask, np.uint8).flatten(order='F')
    n = flat.size
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [n]])
    counts = np.diff(idx)
    if flat[0] == 1:  # runs must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def rle_counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    assert total == h * w, (total, h * w)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((h, w), order='F')


def rle_counts_to_string(counts: Sequence[int]) -> bytes:
    """maskApi.c rleToString: 6-bit varints with continuation bit and
    second-order deltas (x -= cnts[i-2] for i > 2)."""
    counts = [int(c) for c in counts]
    out = bytearray()
    for i, c in enumerate(counts):
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(ch + 48)
    return bytes(out)


def rle_string_to_counts(s: Union[bytes, str]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode('ascii')
    counts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_mask(mask: np.ndarray) -> Dict:
    """Binary (h, w) mask -> COCO compressed RLE dict (pycocotools.mask.encode
    equivalent). ``counts`` is an ascii str for json compatibility."""
    h, w = mask.shape
    if _maskc is not None:
        s = _maskc.encode(
            np.ascontiguousarray(np.asarray(mask, np.uint8).T).tobytes(),
            int(h), int(w))
        return {'size': [int(h), int(w)], 'counts': s.decode('ascii')}
    counts = mask_to_rle_counts(mask)
    return {'size': [int(h), int(w)],
            'counts': rle_counts_to_string(counts).decode('ascii')}


def decode_rle(rle: Dict) -> np.ndarray:
    """COCO RLE dict (compressed str or uncompressed list) -> (h, w) uint8."""
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        if _maskc is not None:
            buf = _maskc.decode(_as_bytes(counts), int(h), int(w))
            return np.frombuffer(buf, np.uint8).reshape((h, w), order='F')
        counts = rle_string_to_counts(counts)
    return rle_counts_to_mask(counts, h, w)


def rle_area(rle: Dict) -> int:
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        if _maskc is not None:
            return int(_maskc.area(_as_bytes(counts)))
        counts = rle_string_to_counts(counts)
    return int(np.asarray(counts, np.int64)[1::2].sum())


def polygons_to_mask(polygons: Sequence[Sequence[float]], h: int,
                     w: int) -> np.ndarray:
    """Rasterize COCO polygons ([[x0, y0, x1, y1, ...], ...]) to (h, w) uint8.

    Matches pycocotools frPyObjects+merge+decode semantics closely: each
    polygon filled, union over polygons (reference structures.py:
    polygon_to_bitmap).
    """
    import cv2
    mask = np.zeros((h, w), np.uint8)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        # pycocotools uses a scanline fill of the closed polygon with
        # upscale+rounding; cv2.fillPoly with rounded int coords is the
        # standard mmcv-compatible approximation.
        pts = np.round(pts).astype(np.int32)
        cv2.fillPoly(mask, [pts], 1)
    return mask


def ann_to_mask(segm, h: int, w: int) -> np.ndarray:
    """COCO annotation 'segmentation' field (polygons or RLE) -> binary mask."""
    if isinstance(segm, list):
        return polygons_to_mask(segm, h, w)
    if isinstance(segm, dict):
        counts = segm['counts']
        if isinstance(counts, list):  # uncompressed RLE
            return rle_counts_to_mask(counts, h, w)
        return decode_rle(segm)
    raise TypeError(type(segm))


def _masks_pairwise_iou(d_masks: List[np.ndarray], g_masks: List[np.ndarray],
                        iscrowd: Sequence[bool]) -> np.ndarray:
    out = np.zeros((len(d_masks), len(g_masks)))
    for j, (gm, crowd) in enumerate(zip(g_masks, iscrowd)):
        g_area = gm.sum()
        for i, dm in enumerate(d_masks):
            inter = np.logical_and(dm, gm).sum()
            d_area = dm.sum()
            denom = d_area if crowd else (d_area + g_area - inter)
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def rle_iou(dets: List[Dict], gts: List[Dict],
            iscrowd: Sequence[bool]) -> np.ndarray:
    """Pairwise mask IoU of RLE dicts (pycocotools.mask.iou equivalent):
    for crowd gts the denominator is the det area (IoF)."""
    if not dets or not gts:
        return np.zeros((len(dets), len(gts)))
    if _maskc is not None and \
            all(isinstance(r['counts'], (bytes, str)) for r in dets) and \
            all(isinstance(r['counts'], (bytes, str)) for r in gts):
        # run-length-domain IoU — no dense decode (maskApi.c rleIou)
        flat = _maskc.iou([_as_bytes(d['counts']) for d in dets],
                          [_as_bytes(g['counts']) for g in gts],
                          [int(bool(c)) for c in iscrowd])
        return np.asarray(flat).reshape(len(dets), len(gts))
    d_masks = [decode_rle(d).astype(bool) for d in dets]
    g_masks = [decode_rle(g).astype(bool) for g in gts]
    return _masks_pairwise_iou(d_masks, g_masks, iscrowd)


def segm_iou(dets: List, gts: List, iscrowd: Sequence[bool],
             h: int, w: int) -> np.ndarray:
    """Pairwise mask IoU where entries may be RLE dicts OR polygon lists
    (gt annotations keep their original representation)."""
    if not dets or not gts:
        return np.zeros((len(dets), len(gts)))
    d_masks = [ann_to_mask(d, h, w).astype(bool) for d in dets]
    g_masks = [ann_to_mask(g, h, w).astype(bool) for g in gts]
    return _masks_pairwise_iou(d_masks, g_masks, iscrowd)
