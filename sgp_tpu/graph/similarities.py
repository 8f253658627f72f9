"""Similarity / distance matrices for graph construction.

Host-side numpy re-implementation of the reference's
``tsl/ops/similarities.py`` (gaussian kernel, haversine geographical
distance, top-k sparsification, pearson, correntropy) without the sklearn
dependency — all pairwise kernels are written directly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from sgp_tpu import epsilon

_AVG_EARTH_RADIUS_KM = 6371.0088


def gaussian_kernel(x: np.ndarray, theta: Optional[float] = None
                    ) -> np.ndarray:
    """``exp(-(x/theta)^2)``; ``theta`` defaults to ``std(x)``
    (``tsl/ops/similarities.py:58-62``)."""
    if theta is None:
        theta = np.std(x)
    return np.exp(-np.square(x / theta))


def thresholded_gaussian_kernel(x: np.ndarray, theta: Optional[float] = None,
                                threshold: Optional[float] = None,
                                threshold_on_input: bool = False
                                ) -> np.ndarray:
    if theta is None:
        theta = np.std(x)
    weights = np.exp(-np.square(x / theta))
    if threshold is not None:
        mask = x > threshold if threshold_on_input else weights < threshold
        weights[mask] = 0.0
    return weights


def geographical_distance(latlon: np.ndarray, to_rad: bool = True
                          ) -> np.ndarray:
    """Pairwise haversine distance in km for ``[N, 2]`` (lat, lon) points
    (``tsl/ops/similarities.py:65-101``)."""
    x = np.asarray(latlon, np.float64)
    if to_rad:
        x = np.radians(x)
    lat, lon = x[:, 0], x[:, 1]
    dlat = lat[:, None] - lat[None, :]
    dlon = lon[:, None] - lon[None, :]
    a = (np.sin(dlat / 2) ** 2
         + np.cos(lat)[:, None] * np.cos(lat)[None, :]
         * np.sin(dlon / 2) ** 2)
    return 2 * _AVG_EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def pearson_similarity(x: np.ndarray) -> np.ndarray:
    """Pearson correlation between rows of ``x [N, T]``
    (``tsl/ops/similarities.py:8-21``); unit diagonal."""
    xc = x - x.mean(1, keepdims=True)
    norms = np.linalg.norm(xc, axis=1)
    corr = (xc @ xc.T) / (norms[:, None] * norms[None, :] + 1e-8)
    np.fill_diagonal(corr, 1.0)
    return corr


def _rbf_kernel(x: np.ndarray, gamma: float) -> np.ndarray:
    """Pairwise ``exp(-gamma * ||xi - xj||^2)`` between rows of ``x``."""
    sq = np.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return np.exp(-gamma * np.maximum(d2, 0.0))


def correntropy(x: np.ndarray, period: int,
                mask: Optional[np.ndarray] = None,
                gamma: float = 0.05) -> np.ndarray:
    """Windowed correntropy similarity between the ``N`` columns of
    ``x [T, N]`` (``tsl/ops/similarities.py:24-55``): accumulate an RBF
    kernel over non-overlapping windows of length ``period``, masking
    windows with missing values, and average."""
    if mask is None:
        mask = (~np.isnan(x)).astype(np.uint8)[..., None]
    sim = np.zeros((x.shape[1], x.shape[1]))
    tot = np.zeros_like(sim)
    for i in range(period, len(x), period):
        xi = x[i - period:i].T  # [N, period]
        m = mask[i - period:i].min(0)  # [N, 1]
        si = _rbf_kernel(np.nan_to_num(xi), gamma=gamma)
        m2 = m * m.T
        sim += si * m2
        tot += m2
    return sim / (tot + epsilon)


def top_k(matrix: np.ndarray, k: int, include_self: bool = False,
          keep_values: bool = False) -> np.ndarray:
    """Keep the top-``k`` entries of each row, zeroing the rest
    (``tsl/ops/similarities.py:104-122``)."""
    dim = matrix.shape[1]
    if not include_self:
        assert matrix.shape[0] == matrix.shape[1]
        matrix = matrix - np.diag([np.inf] * dim).astype(matrix.dtype)
    non_topk = np.argpartition(matrix, -k)[:, :-k]
    knn = matrix.copy() if keep_values else np.ones_like(matrix)
    knn[np.arange(matrix.shape[0])[:, None], non_topk] = 0
    return knn
