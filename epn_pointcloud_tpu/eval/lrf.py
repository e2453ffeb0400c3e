"""Local-reference-frame / PCA anchor-feature transforms used by the
3DMatch evaluation tooling (rebuild of
SPConvNets/datasets/evaluation/utils.py:14-102)."""

from __future__ import annotations

import numpy as np


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def create_anchors_from_points(pts: np.ndarray) -> np.ndarray:
    """Unit-norm anchor directions from a point set
    (ref: evaluation/utils.py:5-11)."""
    norms = np.sqrt(np.sum(pts ** 2, axis=1))
    sel = pts[norms > 0.5]
    return sel / np.sqrt(np.sum(sel ** 2, axis=1, keepdims=True))


def find_anchor_lrf(feature: np.ndarray, anchor: np.ndarray) -> np.ndarray:
    """Local reference frame from the strongest anchor responses
    (ref: evaluation/utils.py:14-26). feature [na, c]; anchor [na, 3]."""
    main_idx = int(np.argmax(np.sum(feature ** 2, 1)))
    zaxis = anchor[main_idx]
    yidx = [idx for idx, ax in enumerate(anchor)
            if abs(np.dot(zaxis, ax)) < 1e-4]
    if not yidx:  # degenerate configuration: pick most orthogonal axes
        dots = np.abs(anchor @ zaxis)
        yidx = list(np.argsort(dots)[:3])
    xaxis = anchor[yidx[int(np.argmax(np.sum(feature[yidx] ** 2, 1)))]]
    yaxis = np.cross(xaxis, zaxis)
    return np.array([xaxis, yaxis, zaxis], dtype=np.float32)


def transform_anchor_feat(feats: np.ndarray, anchors: np.ndarray,
                          T: np.ndarray, sigma: float) -> np.ndarray:
    """Rotate an anchor-indexed feature by T via spherical 3-NN interpolation
    over anchor directions (ref: evaluation/utils.py:85-102).

    feats [n, na, c]; anchors [na, 3]; T [3, 3] (or [4, 4])."""
    anchors_T = anchors @ T[:3, :3].T
    dists = np.sum(anchors[:, None] * anchors_T[None], 2) - 1.0  # [na, na]
    indices = np.argsort(-dists, 1)[:, :3]                       # [na, 3]
    weights = np.take_along_axis(dists, indices, axis=1)
    influences = _softmax(weights / sigma, 1)                    # [na, 3]
    new_feats = feats[:, indices, :]                             # [n, na, 3, c]
    return (new_feats * influences[None, :, :, None]).sum(2)


def pca_transform(feats: np.ndarray, anchor: np.ndarray) -> np.ndarray:
    """Canonicalize per-sample anchor features by their LRF
    (ref: evaluation/utils.py:29-36). feats [n, na, c]."""
    out = []
    for i in range(feats.shape[0]):
        r = find_anchor_lrf(feats[i], anchor)
        out.append(transform_anchor_feat(feats[i][None], anchor, r, 0.1)[0])
    return np.array(out, dtype=np.float32)
