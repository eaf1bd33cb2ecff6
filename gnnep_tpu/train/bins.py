"""Target-bin statistics (quantile bins over log targets).

Parity port of the reference's `_compute_bin_statistics`
(`/root/reference/scripts/train.py:425-478`). As in the reference, the
computed weights participate in training only when `freq_gamma > 0`; the
scales/probs are carried for diagnostics.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def compute_bin_statistics(values: np.ndarray, num_bins: int, gamma: float,
                           eps: float = 1e-6
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    if values.ndim != 2:
        raise ValueError(f"Expected 2D targets, got {values.shape}")
    if np.any(values <= 0):
        raise ValueError("Targets must be strictly positive for bin statistics.")
    total, t_dim = values.shape
    if total == 0:
        raise ValueError("Cannot compute bin statistics from an empty array.")
    bins = max(int(num_bins), 1)
    logv = np.log(values)
    edges = np.empty((t_dim, bins + 1))
    weights = np.empty((t_dim, bins))
    scales = np.empty((t_dim, bins))
    probs = np.empty((t_dim, bins))
    for d in range(t_dim):
        dim_log, dim_vals = logv[:, d], values[:, d]
        global_median = float(np.median(dim_vals))
        if bins == 1 or np.allclose(dim_log, dim_log[0]):
            edges[d, :2] = [-np.inf, np.inf]
            probs[d, :1], weights[d, :1] = 1.0, 1.0
            scales[d, :1] = max(global_median, eps)
            if bins > 1:  # degenerate distribution: collapse remaining bins
                edges[d, 2:] = np.inf
                probs[d, 1:] = weights[d, 1:] = 0.0
                scales[d, 1:] = max(global_median, eps)
            continue
        q = np.quantile(dim_log, np.linspace(0.0, 1.0, bins + 1))
        if not np.all(np.diff(q) > 0):
            q = np.linspace(dim_log.min(), dim_log.max(), bins + 1)
        q[0], q[-1] = -np.inf, np.inf
        edges[d] = q
        idx = np.digitize(dim_log, q[1:-1], right=False)
        counts = np.bincount(idx, minlength=bins).astype(float)
        p = np.clip(counts / max(counts.sum(), 1.0), eps, None)
        p /= p.sum()
        probs[d] = p
        inv = np.power(1.0 / p, gamma) if gamma != 0.0 else np.ones_like(p)
        weights[d] = inv / inv.mean()
        for b in range(bins):
            m = idx == b
            scales[d, b] = max(float(np.median(dim_vals[m])) if m.any()
                               else global_median, eps)
    return edges, weights, scales, probs
