"""ModelNet retrieval mAP (rebuild of
SPConvNets/datasets/evaluation/retrieval.py:1-13 — precision@n of kNN in
descriptor space)."""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def modelnet_retrieval_mAP(feats, labels, n: int = 1) -> float:
    """feats [m, c] descriptors; labels [m]; mean precision@n over queries
    (self-match excluded)."""
    feats = np.asarray(feats)
    labels = np.asarray(labels).reshape(-1)
    tree = cKDTree(feats)
    _, idx = tree.query(feats, k=n + 1)
    idx = idx[:, 1:]                      # drop self
    hits = labels[idx] == labels[:, None]
    return float(hits.mean())
