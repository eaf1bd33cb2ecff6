"""Artifact persistence: member checkpoints, scaler state, conformal state.

Schema-equivalent to the reference's artifact trio (`model_{i}.pt`,
`scaler_state.pt`, `conformal.pt`, train.py:2095-2122) in numpy-native
formats. Checkpoints are the architecture contract: evaluate/predict rebuild
the model purely from saved parameter shapes plus the embedded config, as the
reference infers architecture from state-dict shapes (evaluate.py:146-176).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..data.transforms import FeatureScaler, LogTransformer
from ..models.alignn import AlignnConfig, init_alignn


def _flat_leaves(params) -> List[np.ndarray]:
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def save_member(path: str | Path, params, cfg: AlignnConfig) -> None:
    leaves = _flat_leaves(params)
    payload = {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)}
    payload["config_json"] = np.array(json.dumps(dataclasses.asdict(cfg)))
    np.savez(path, **payload)


def load_member(path: str | Path) -> Tuple[Dict, AlignnConfig]:
    """Rebuild (params, config): re-init a template from the embedded config
    and graft the saved leaves onto it in flatten order."""
    with np.load(path, allow_pickle=False) as data:
        cfg = AlignnConfig(**json.loads(str(data["config_json"])))
        leaves = [data[k] for k in sorted(k for k in data.files if k.startswith("leaf_"))]
    template = init_alignn(jax.random.PRNGKey(0), cfg)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(f"Checkpoint {path} has {len(leaves)} arrays; "
                         f"architecture expects {len(t_leaves)}")
    for i, (a, b) in enumerate(zip(t_leaves, leaves)):
        if a.shape != b.shape:
            raise ValueError(f"Checkpoint {path} leaf {i}: shape {b.shape} != {a.shape}")
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves]), cfg


def save_scaler_state(path: str | Path, scaler: FeatureScaler,
                      transformer: Optional[LogTransformer],
                      dims: Optional[Dict] = None) -> None:
    payload = {}
    for key, val in scaler.state_dict().items():
        if val is not None:
            payload[key] = np.asarray(val)
    meta = {"target_transform": "log" if transformer is not None else "none"}
    if dims:
        meta["dims"] = dims
    payload["meta_json"] = np.array(json.dumps(meta))
    if transformer is not None:
        state = transformer.state_dict()
        payload["log_means"] = state["means"]
        payload["log_stds"] = state["stds"]
    np.savez(path, **payload)


def load_scaler_state(path: str | Path) -> Tuple[FeatureScaler,
                                                 Optional[LogTransformer], Dict]:
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["meta_json"])) if "meta_json" in data.files else {}
        state = {k: data[k] for k in
                 ("scalar_mean", "scalar_std", "embed_mean", "embed_std",
                  "global_mean", "global_std") if k in data.files}
        scaler = FeatureScaler.from_state_dict(state)
        transformer = None
        if "log_means" in data.files:
            transformer = LogTransformer.from_state_dict(
                {"means": data["log_means"], "stds": data["log_stds"]})
    return scaler, transformer, meta


def save_conformal(path: str | Path, conf: Dict,
                   affine_a: np.ndarray, affine_b: np.ndarray) -> None:
    Path(path).write_text(json.dumps({
        "q": np.asarray(conf["q"]).tolist(),
        "method": conf["method"],
        "alpha": conf["alpha"],
        "affine_a": np.asarray(affine_a).tolist(),
        "affine_b": np.asarray(affine_b).tolist(),
    }, indent=2))


def load_conformal(path: str | Path) -> Dict:
    raw = json.loads(Path(path).read_text())
    return {
        "q": np.asarray(raw["q"], dtype=np.float64),
        "method": raw["method"],
        "alpha": float(raw["alpha"]),
        "affine_a": np.asarray(raw["affine_a"], dtype=np.float64),
        "affine_b": np.asarray(raw["affine_b"], dtype=np.float64),
    }


def save_pytree(path: str | Path, tree, meta: Optional[Dict] = None) -> None:
    """Persist an arbitrary pytree of arrays (leaves in flatten order) plus a
    JSON metadata blob — used for mid-training resume state."""
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
    payload = {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)}
    payload["meta_json"] = np.array(json.dumps(meta or {}))
    tmp = Path(str(path) + ".tmp.npz")  # np.savez appends .npz otherwise
    np.savez(tmp, **payload)
    tmp.replace(path)


def load_pytree_meta(path: str | Path) -> Dict:
    """Read only the JSON metadata of a `save_pytree` archive (no template
    needed — lets callers validate layout compatibility before loading)."""
    with np.load(path, allow_pickle=False) as data:
        if "meta_json" not in data.files:  # legacy archive without metadata
            import warnings

            # callers use this to validate optimizer layout before resume;
            # an empty dict silently skips that guard, so say so out loud
            warnings.warn(f"{path}: legacy resume archive has no metadata — "
                          "layout-compatibility checks will be skipped",
                          stacklevel=2)
            return {}
        return json.loads(str(data["meta_json"]))


def load_pytree(path: str | Path, template) -> Tuple[object, Dict]:
    """Rebuild a pytree saved by `save_pytree` onto `template`'s structure."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["meta_json"]))
        leaves = [data[k] for k in sorted(k for k in data.files
                                          if k.startswith("leaf_"))]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(f"{path}: {len(leaves)} leaves != template "
                         f"{len(t_leaves)}")
    cast = [jnp.asarray(l, dtype=np.asarray(t).dtype)
            for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast), meta


def member_paths(save_dir: str | Path) -> List[Path]:
    """Sorted model_{i}.npz checkpoints under an ensemble directory."""
    d = Path(save_dir)
    out = []
    i = 0
    while (d / f"model_{i}.npz").exists():
        out.append(d / f"model_{i}.npz")
        i += 1
    return out
