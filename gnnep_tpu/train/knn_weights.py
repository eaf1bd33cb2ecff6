"""KNN density weighting over penultimate embeddings (opt-in).

Re-implements the reference's inverse-density sample weighting
(`/root/reference/scripts/train.py:930-1010`): snapshot embeddings of the
train set, z-score them, estimate local density via k-NN distances
(ρ = k / Σd), weight ρ^−α, downweight by local label variance
(÷ (1 + β·var)), clip, and mean-normalize. Weights are keyed by global
dataset index and activate the epoch after they are computed.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.alignn import AlignnConfig, alignn_embed


@functools.lru_cache(maxsize=32)
def embed_fn(model_cfg: AlignnConfig):
    """Memoized jitted embedding forward — a fresh `jax.jit(lambda ...)`
    per call recompiles the same program on every weight refresh (and each
    compile can take minutes through a remote compile service)."""
    return jax.jit(lambda params, batch: alignn_embed(params, model_cfg, batch))


_DEVICE_KNN_MIN_N = 4096  # below this, exact host kNN is faster than a jit


@functools.lru_cache(maxsize=8)
def _device_knn_fn(k_eff: int, chunk: int, n: int, d: int):
    """Jitted chunked brute-force kNN: ‖a−b‖² = ‖a‖²+‖b‖²−2a·b GEMMs +
    `lax.top_k` per query chunk — the TPU-native backend for large
    snapshots (an O(n²) host kNN over 10k+ embeddings stalls the training
    loop; the same flops are sub-second on the MXU). HIGHEST-precision
    matmul so f32 distances do not degrade to bf16 on TPU."""

    @jax.jit
    def run(Z):
        sq = jnp.sum(Z * Z, axis=1)
        pad = (-n) % chunk
        q = jnp.pad(Z, ((0, pad), (0, 0)))
        qsq = jnp.pad(sq, (0, pad))
        qid = jnp.arange(n + pad)

        def one(args):
            qc, qsc, qic = args
            d2 = qsc[:, None] + sq[None, :] - 2.0 * jnp.dot(
                qc, Z.T, precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.where(qic[:, None] == jnp.arange(n)[None, :],
                           jnp.inf, d2)
            nd, idx = jax.lax.top_k(-d2, k_eff)
            return jnp.sqrt(jnp.maximum(-nd, 0.0)), idx

        dd, ii = jax.lax.map(one, (q.reshape(-1, chunk, d),
                                   qsq.reshape(-1, chunk),
                                   qid.reshape(-1, chunk)))
        return dd.reshape(-1, k_eff)[:n], ii.reshape(-1, k_eff)[:n]

    return run


def knn_neighbors(Zs: np.ndarray, k_eff: int,
                  backend: Optional[str] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(dists [n,k], indices [n,k]) of each row's k nearest OTHER rows.

    backend: 'device' (chunked GEMM + top_k on the accelerator), 'host'
    (sklearn, numpy fallback — exact, matches the reference's
    sklearn/torch.cdist path), or None = auto (device for large n).
    GNNEP_KNN_BACKEND overrides."""
    n, d = Zs.shape
    backend = backend or os.environ.get("GNNEP_KNN_BACKEND") or (
        "device" if n >= _DEVICE_KNN_MIN_N else "host")
    if backend == "device":
        dd, ii = _device_knn_fn(int(k_eff), min(1024, max(128, n // 8)),
                                n, d)(jnp.asarray(Zs, jnp.float32))
        return np.asarray(dd), np.asarray(ii)
    try:
        from sklearn.neighbors import NearestNeighbors

        nbrs = NearestNeighbors(n_neighbors=k_eff + 1,
                                metric="euclidean").fit(Zs)
        dists, ind = nbrs.kneighbors(Zs, n_neighbors=k_eff + 1)
        return dists[:, 1:], ind[:, 1:]
    except Exception:  # numpy fallback (reference uses torch.cdist)
        D = np.linalg.norm(Zs[:, None] - Zs[None], axis=-1)
        np.fill_diagonal(D, np.inf)
        ind = np.argsort(D, axis=1)[:, :k_eff]
        return np.take_along_axis(D, ind, axis=1), ind


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
    dists, ind = knn_neighbors(Zs, k_eff)

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
