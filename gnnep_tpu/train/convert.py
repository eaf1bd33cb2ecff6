"""Convert reference (PyTorch/PyG) artifacts into gnnep_tpu's schema.

Migration path for users of the reference pipeline
(`/root/reference/scripts/train.py:2095-2122` artifact trio):

- ``scaler_state.pt``  → ``scaler_state.npz``  (feature scaler + log transform)
- ``conformal.pt``     → ``conformal.json``    (q, method, α, affine debias)
- ``model_{i}.pt``     → ``model_{i}.npz``     (HeteroAlignnRegressor state
  dict → our param pytree; weights transposed to [in, out], PyG
  ``TransformerConv`` linears mapped onto :class:`TransformerConvParams`)

Architecture is inferred from tensor shapes exactly as the reference's own
evaluate/predict do (evaluate.py:146-176, predict.py:165-224); ``heads`` is
the one hyperparameter not recoverable from shapes (predict.py:84) and must
be supplied. Requires ``torch`` (CPU build is enough) to read the .pt files.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from ..data.transforms import FeatureScaler, LogTransformer
from ..models.alignn import AlignnConfig
from ..ops.graph_attention import TransformerConvParams
from .artifacts import save_conformal, save_member, save_scaler_state


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().float().cpu().numpy(), dtype=np.float32)


def convert_scaler_state(pt_path: str | Path, out_path: str | Path
                         ) -> Tuple[FeatureScaler, LogTransformer]:
    """scaler_state.pt → scaler_state.npz (keys match 1:1, train.py:1421-1435)."""
    raw = _torch_load(pt_path)
    state = {k: _np(raw[k]) for k in ("scalar_mean", "scalar_std",
                                      "embed_mean", "embed_std",
                                      "global_mean", "global_std")
             if raw.get(k) is not None}
    scaler = FeatureScaler.from_state_dict(state)
    transformer = None
    if raw.get("target_transform") == "log" and "log_transform" in raw:
        transformer = LogTransformer.from_state_dict(
            {"means": _np(raw["log_transform"]["means"]),
             "stds": _np(raw["log_transform"]["stds"])})
    save_scaler_state(out_path, scaler, transformer)
    return scaler, transformer


def convert_conformal(pt_path: str | Path, out_path: str | Path) -> Dict:
    """conformal.pt → conformal.json ({q, method, alpha, affine_a/b})."""
    raw = _torch_load(pt_path)
    conf = {"q": _np(raw["q"]), "method": str(raw["method"]),
            "alpha": float(raw["alpha"])}
    save_conformal(out_path, conf, _np(raw["affine_a"]), _np(raw["affine_b"]))
    conf["affine_a"] = _np(raw["affine_a"])
    conf["affine_b"] = _np(raw["affine_b"])
    return conf


def _conv_params(sd: Dict[str, np.ndarray], prefix: str) -> TransformerConvParams:
    """PyG TransformerConv linears → TransformerConvParams ([in, out] layout).

    PyG layout (all torch [out, in]): lin_query/lin_key/lin_value/lin_skip
    with bias, lin_edge and lin_beta bias-free — matching the conv math in
    `ops/graph_attention.py` (train.py:308,326 semantics)."""
    T = lambda k: sd[prefix + k].T.copy()
    b = lambda k: sd[prefix + k].copy()
    return TransformerConvParams(
        w_query=T("lin_query.weight"), b_query=b("lin_query.bias"),
        w_key=T("lin_key.weight"), b_key=b("lin_key.bias"),
        w_value=T("lin_value.weight"), b_value=b("lin_value.bias"),
        w_edge=T("lin_edge.weight"),
        w_skip=T("lin_skip.weight"), b_skip=b("lin_skip.bias"),
        w_beta=T("lin_beta.weight"))


def convert_member_state(state: Dict, *, heads: int,
                         dropout: float = 0.15) -> Tuple[Dict, AlignnConfig]:
    """HeteroAlignnRegressor state dict → (param pytree, AlignnConfig).

    `state` maps reference parameter names (train.py:303-401,528-586) to
    arrays/tensors. The base model's unused `output_heads` (the hetero
    wrapper never calls them, train.py:579-586) are dropped."""
    sd = {k: (v if isinstance(v, np.ndarray) else _np(v))
          for k, v in state.items()}
    T = lambda k: sd[k].T.copy()

    def mlp(prefix):
        return {"w0": T(f"{prefix}.0.weight"), "b0": sd[f"{prefix}.0.bias"],
                "w1": T(f"{prefix}.2.weight"), "b1": sd[f"{prefix}.2.bias"]}

    node_dim, hidden = T("base.node_encoder.0.weight").shape
    edge_dim = sd["base.edge_encoder.0.weight"].shape[1]
    angle_dim = sd["base.angle_encoder.0.weight"].shape[1]
    layers = 1 + max(int(m.group(1)) for k in sd
                     if (m := re.match(r"base\.edge_blocks\.(\d+)\.", k)))
    global_dim = sd["base.feat_proj.0.weight"].shape[1] - hidden
    target_dim = 1 + max(int(m.group(1)) for k in sd
                         if (m := re.match(r"mean_heads\.(\d+)\.", k)))

    params = {
        "node_enc": mlp("base.node_encoder"),
        "edge_enc": mlp("base.edge_encoder"),
        "angle_enc": mlp("base.angle_encoder"),
        "edge_blocks": [], "node_blocks": [],
        "feat_proj": {"w": T("base.feat_proj.0.weight"),
                      "b": sd["base.feat_proj.0.bias"]},
        "mean_head": {
            "w": np.concatenate([T(f"mean_heads.{t}.weight")
                                 for t in range(target_dim)], axis=1),
            "b": np.concatenate([sd[f"mean_heads.{t}.bias"]
                                 for t in range(target_dim)])},
        "logvar_head": {
            "w": np.concatenate([T(f"logvar_heads.{t}.weight")
                                 for t in range(target_dim)], axis=1),
            "b": np.concatenate([sd[f"logvar_heads.{t}.bias"]
                                 for t in range(target_dim)])},
    }
    for i in range(layers):
        eb = f"base.edge_blocks.{i}."
        nb = f"base.node_blocks.{i}."
        params["edge_blocks"].append({
            "conv": _conv_params(sd, eb + "conv."),
            "ln_scale": sd[eb + "norm.weight"].copy(),
            "ln_bias": sd[eb + "norm.bias"].copy()})
        params["node_blocks"].append({
            "edge_proj_w": T(nb + "edge_proj.weight"),
            "edge_proj_b": sd[nb + "edge_proj.bias"].copy(),
            "conv": _conv_params(sd, nb + "conv."),
            "ln_scale": sd[nb + "norm.weight"].copy(),
            "ln_bias": sd[nb + "norm.bias"].copy()})
    cfg = AlignnConfig(node_dim=node_dim, edge_dim=edge_dim,
                       angle_dim=angle_dim, global_dim=global_dim,
                       target_dim=target_dim, hidden=hidden, layers=layers,
                       heads=heads, dropout=dropout)
    return params, cfg


def convert_ensemble(ref_dir: str | Path, out_dir: str | Path, *,
                     heads: int = 4, dropout: float = 0.15,
                     verbose: bool = True) -> int:
    """Convert a full reference ensemble directory. Returns the number of
    member checkpoints converted (0 if none present — the public mirror
    strips them, .MISSING_LARGE_BLOBS)."""
    ref_dir, out_dir = Path(ref_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if (ref_dir / "scaler_state.pt").exists():
        convert_scaler_state(ref_dir / "scaler_state.pt",
                             out_dir / "scaler_state.npz")
        if verbose:
            print(f"converted scaler_state.pt -> {out_dir/'scaler_state.npz'}")
    if (ref_dir / "conformal.pt").exists():
        convert_conformal(ref_dir / "conformal.pt", out_dir / "conformal.json")
        if verbose:
            print(f"converted conformal.pt -> {out_dir/'conformal.json'}")
    n = 0
    while (ref_dir / f"model_{n}.pt").exists():
        state = _torch_load(ref_dir / f"model_{n}.pt")
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        params, cfg = convert_member_state(state, heads=heads, dropout=dropout)
        save_member(out_dir / f"model_{n}.npz", params, cfg)
        if verbose:
            print(f"converted model_{n}.pt -> {out_dir/f'model_{n}.npz'} "
                  f"(hidden={cfg.hidden} layers={cfg.layers})")
        n += 1
    return n
