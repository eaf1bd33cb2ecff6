"""Evaluation metrics computed on host from collected predictions.

Mirrors the reference's eval pass (`/root/reference/scripts/train.py:726-846`)
and error-stat report (`train.py:481-525`): heteroscedastic NLL, linear/log
MAE & RMSE, 1σ z-space coverage, 9-level Gaussian ECE, Spearman(|err|, σ),
and the per-target RMSE/MAE/percentile table.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

try:
    from scipy.stats import spearmanr as _spearmanr
except ImportError:  # pragma: no cover
    _spearmanr = None

from ..data.transforms import LogTransformer

# Φ⁻¹((1+p)/2) for p in 0.1..0.9 — the reference materializes these via
# torch.distributions.Normal.icdf (train.py:794-801)
_PROB_LEVELS = np.linspace(0.1, 0.9, 9)
try:
    from scipy.stats import norm as _norm

    _Z_THRESH = _norm.ppf((1.0 + _PROB_LEVELS) / 2.0)
except ImportError:  # pragma: no cover
    _Z_THRESH = np.array([0.1257, 0.2533, 0.3853, 0.5244, 0.6745,
                          0.8416, 1.0364, 1.2816, 1.6449])


def eval_metrics(mean_z: np.ndarray, sigma_z: np.ndarray, y: np.ndarray,
                 transformer: LogTransformer) -> Dict[str, float]:
    """Scalar eval metrics over one split; z = log-standardized space."""
    y_z = transformer.transform(y)
    var = sigma_z ** 2
    logvar = np.log(np.maximum(var, 1e-30))
    diff = mean_z - y_z
    nll = 0.5 * (logvar + diff ** 2 / np.maximum(var, 1e-30))
    pred = transformer.inverse(mean_z)
    abs_lin = np.abs(pred - y)
    n = y.shape[0]

    abs_z = np.abs(diff)
    coverage = float((abs_z <= sigma_z).mean())
    cov_levels = (abs_z[None] <= _Z_THRESH[:, None, None] * sigma_z[None]).mean(axis=(1, 2))
    ece = float(np.abs(cov_levels - _PROB_LEVELS).mean())

    spear = float("nan")
    if _spearmanr is not None and abs_z.size > 1:
        flat_e, flat_s = abs_z.ravel(), np.clip(sigma_z.ravel(), 1e-6, None)
        ok = np.isfinite(flat_e) & np.isfinite(flat_s)
        if ok.sum() > 1:
            r = _spearmanr(flat_e[ok], flat_s[ok])
            spear = float(getattr(r, "statistic", r[0]))

    eps = 1e-6
    mae_log = float(np.abs(np.log(np.clip(pred, eps, None))
                           - np.log(np.clip(y, eps, None))).sum() / n)
    return {
        "nll": float(nll.mean(axis=1).sum() / n),
        "mae": float(abs_lin.sum() / n),            # per-sample sum across targets
        "rmse": float(np.sqrt(((pred - y) ** 2).mean())),
        "mae_log": mae_log,
        "coverage": coverage,
        "ece": ece,
        "spearman": spear,
        "logvar_mean": float(logvar.mean()),
        "sigma_max": float(sigma_z.max()) if sigma_z.size else float("nan"),
    }


TARGET_NAMES = {0: "bulk_modulus", 1: "shear_modulus"}


def error_stats(preds: np.ndarray, targets: np.ndarray) -> Dict[str, Dict[str, float]]:
    """Per-target + overall error table (reference compute_error_stats)."""
    if preds.shape != targets.shape:
        raise ValueError(f"Preds shape {preds.shape} != targets {targets.shape}")
    err = preds - targets
    if err.ndim == 1:
        err = err[:, None]
    abs_err = np.abs(err)
    out: Dict[str, Dict[str, float]] = {}

    def block(e: np.ndarray, a: np.ndarray) -> Dict[str, float]:
        return {
            "rmse": float(np.sqrt((e ** 2).mean())),
            "mae": float(a.mean()),
            "std": float(e.std(ddof=0)),
            "mean_error": float(e.mean()),
            "abs_p50": float(np.quantile(a, 0.5)),
            "abs_p90": float(np.quantile(a, 0.9)),
            "abs_p95": float(np.quantile(a, 0.95)),
            "max_abs": float(a.max()),
        }

    for t in range(err.shape[1]):
        out[TARGET_NAMES.get(t, f"target_{t}")] = block(err[:, t], abs_err[:, t])
    out["overall"] = block(err.ravel(), abs_err.ravel())
    return out
