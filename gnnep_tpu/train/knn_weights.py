"""KNN density weighting over penultimate embeddings (opt-in).

Re-implements the reference's inverse-density sample weighting
(`/root/reference/scripts/train.py:930-1010`): snapshot embeddings of the
train set, z-score them, estimate local density via k-NN distances
(ρ = k / Σd), weight ρ^−α, downweight by local label variance
(÷ (1 + β·var)), clip, and mean-normalize. Weights are keyed by global
dataset index and activate the epoch after they are computed.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import functools

import jax
import numpy as np

from ..models.alignn import AlignnConfig, alignn_embed


@functools.lru_cache(maxsize=32)
def embed_fn(model_cfg: AlignnConfig):
    """Memoized jitted embedding forward — a fresh `jax.jit(lambda ...)`
    per call recompiles the same program on every weight refresh (and each
    compile can take minutes through a remote compile service)."""
    return jax.jit(lambda params, batch: alignn_embed(params, model_cfg, batch))


def compute_knn_weights(model_cfg: AlignnConfig, params, snapshot_batches,
                        store, *, k: int, eps: float, alpha: float, beta: float,
                        clip_min: Optional[float], clip_max: Optional[float]
                        ) -> Dict[int, float]:
    embed = embed_fn(model_cfg)
    zs: List[np.ndarray] = []
    ys: List[np.ndarray] = []
    idxs: List[np.ndarray] = []
    for b in snapshot_batches:
        z = np.asarray(embed(params, b))
        mask = np.asarray(b.graph_mask) > 0
        zs.append(z[mask])
        ys.append(np.asarray(b.y)[mask])
        idxs.append(np.asarray(b.sample_index)[mask])
    if not zs:
        raise ValueError("No batches produced embeddings for KNN weighting.")
    Z = np.concatenate(zs)
    Y = np.concatenate(ys)
    I = np.concatenate(idxs)

    mean = Z.mean(axis=0)
    std = np.clip(Z.std(axis=0, ddof=0), 1e-8, None)
    Zs = ((Z - mean) / std).astype(np.float32)

    n = Zs.shape[0]
    k_eff = max(1, min(int(k), n - 1))
    try:
        from sklearn.neighbors import NearestNeighbors

        nbrs = NearestNeighbors(n_neighbors=k_eff + 1, metric="euclidean").fit(Zs)
        dists, ind = nbrs.kneighbors(Zs, n_neighbors=k_eff + 1)
        dists, ind = dists[:, 1:], ind[:, 1:]
    except Exception:  # numpy fallback (reference uses torch.cdist)
        D = np.linalg.norm(Zs[:, None] - Zs[None], axis=-1)
        np.fill_diagonal(D, np.inf)
        ind = np.argsort(D, axis=1)[:, :k_eff]
        dists = np.take_along_axis(D, ind, axis=1)

    rho = k_eff / (dists.sum(axis=1) + float(eps))
    w = np.power(rho, -float(alpha))
    neigh_y = Y[ind]                                    # [n, k, T]
    var_local = neigh_y.var(axis=1, ddof=0).mean(axis=1)
    w = w / (1.0 + float(beta) * var_local)
    if clip_min is not None:
        w = np.clip(w, clip_min, None)
    if clip_max is not None:
        w = np.clip(w, None, clip_max)
    w = w / (w.mean() + 1e-12)
    return {int(i): float(wi) for i, wi in zip(I, w)}
