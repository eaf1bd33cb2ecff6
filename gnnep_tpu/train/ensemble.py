"""Deep-ensemble training driver: setup → members → calibration → artifacts.

Orchestration parity with the reference `main` (`/root/reference/scripts/
train.py:1948-2163`): grouped splits + K-fold member validation, per-member
seeds `seed + i*1007`, bootstrap resampling, per-member hidden/dropout/LR
overrides, mixture aggregation on the calibration split, affine debias,
scaled conformal quantiles, and the artifact trio. Members can train
sequentially or — the TPU-native path with homogeneous architectures —
member-parallel via `vmap` (see `gnnep_tpu.parallel.ensemble_vmap`).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.batching import BatchBudget, epoch_batches
from ..data.splits import derive_splits
from ..data.store import GraphStore
from ..data.transforms import FeatureScaler, LogTransformer
from ..models.alignn import AlignnConfig
from .artifacts import (save_conformal, save_member, save_scaler_state)
from .bins import compute_bin_statistics
from .calibrate import (apply_conformal_intervals, conformal_calibration,
                        ensemble_mixture, fit_affine_debias)
from .config import TrainConfig
from .member import train_member
from .metrics import error_stats

N_SG_ONE_HOT = 230


@dataclasses.dataclass
class TrainingSetup:
    """Everything derived from the dataset before member training starts."""

    store: GraphStore            # standardized
    scaler: FeatureScaler
    transformer: LogTransformer
    budget: BatchBudget
    train_idx: List[int]
    val_idx: List[int]
    calib_idx: List[int]
    test_idx: List[int]
    folds: List[List[int]]
    bin_edges: np.ndarray
    bin_weights: np.ndarray
    # giant-graph routing (cfg.giant_graphs='boundary'): graphs exceeding
    # the typical-statistics budget, boundary-partitioned under one shared
    # plan (parallel/giant.py); None when disabled or none exist
    giant: Optional["GiantSet"] = None


def prepare(cfg: TrainConfig, store: Optional[GraphStore] = None) -> TrainingSetup:
    """Load/standardize the dataset and derive splits (train.py:1300-1447)."""
    if store is None:
        store = GraphStore.load_dir(cfg.data_dir)
    if not cfg.use_mat2vec and store.node_dim > 6:
        store = dataclasses.replace(store, node_feats=store.node_feats[:, :6].copy())

    train_idx, val_idx, calib_idx, test_idx, folds = derive_splits(
        store.group_keys(), cfg.seed, cfg.val_frac, cfg.calib_frac,
        cfg.test_frac, cfg.ensemble_size)
    if not train_idx:
        raise ValueError("Training split is empty; adjust fractions or seed.")

    scaler = FeatureScaler.fit(store, train_idx)
    std_store = scaler.apply(store)
    train_targets = store.y[np.asarray(train_idx, dtype=np.int64)]
    transformer = LogTransformer.fit(train_targets)
    bin_edges, bin_weights, _, _ = compute_bin_statistics(
        train_targets, cfg.freq_bins, cfg.freq_gamma, eps=cfg.relative_eps)

    giant = None
    route_giants = getattr(cfg, "giant_graphs", "error") == "boundary"
    if route_giants:
        from ..parallel.giant import build_giant_set, classify_giants

        # fixpoint classification (parallel/giant.py, shared with
        # evaluate/predict): re-plans until the giant set stabilizes, then
        # restores the cover-all guarantee over the normal population
        _, g_idx, budget = classify_giants(
            std_store, range(std_store.n_graphs),
            lambda pop, ca: BatchBudget.plan(
                std_store, pop, cfg.batch_size, slack=cfg.batch_slack,
                quantile=cfg.batch_quantile, cover_all=ca))
        if g_idx:
            giant = build_giant_set(std_store, g_idx,
                                    n_shards=max(int(cfg.edge_shards), 1))
            if cfg.verbose:
                print(f"[Giant] {len(g_idx)} graph(s) exceed the batch "
                      f"budget; routed via boundary partition over "
                      f"{giant.n_shards} edge shard(s) "
                      f"(plan: rn={giant.plan.rn} e_loc={giant.plan.e_loc} "
                      f"l_loc={giant.plan.l_loc} bn={giant.plan.bn} "
                      f"bl={giant.plan.bl})")
    else:
        budget = BatchBudget.plan(std_store, range(std_store.n_graphs),
                                  cfg.batch_size, slack=cfg.batch_slack,
                                  quantile=cfg.batch_quantile, cover_all=True)
    return TrainingSetup(std_store, scaler, transformer, budget, train_idx,
                         val_idx, calib_idx, test_idx, folds, bin_edges,
                         bin_weights, giant=giant)


def model_config(cfg: TrainConfig, store: GraphStore, *, hidden: Optional[int] = None,
                 dropout: Optional[float] = None,
                 budget: Optional[BatchBudget] = None) -> AlignnConfig:
    h = int(hidden if hidden is not None else cfg.hidden)
    if h % cfg.heads != 0:
        raise ValueError(f"Hidden dimension {h} must be divisible by heads ({cfg.heads})")
    return AlignnConfig(
        node_dim=store.node_dim, edge_dim=store.edge_dim, angle_dim=store.angle_dim,
        global_dim=store.global_scalar_dim + N_SG_ONE_HOT,
        target_dim=store.target_dim, hidden=h, layers=cfg.layers, heads=cfg.heads,
        dropout=float(dropout if dropout is not None else cfg.dropout),
        conv_impl=cfg.conv_impl, scan_layers=cfg.scan_layers,
        attn_fused=cfg.attn_fused, attn_eproj=cfg.attn_eproj,
        # packer-enforced window bounds shrink the Pallas kernels' VMEM
        # windows (the packer dilutes dense batches to honor them)
        edge_win64=budget.edge_win64 if budget else 0,
        lg_win64=budget.lg_win64 if budget else 0,
        edge_src_win64=budget.edge_src_win64 if budget else 0,
        lg_src_win64=budget.lg_src_win64 if budget else 0)


def collect_ensemble(members: List[Dict], model_cfgs: List[AlignnConfig],
                     batches, floor: float, giant=None,
                     giant_ids: Optional[List[int]] = None):
    """Member forwards → ([M,N,T] means, [M,N,T] vars, [N,T] targets).
    Fans out over all visible devices via the graph-aligned forward.

    With `giant`/`giant_ids`, boundary-forward predictions for the giant
    graphs are appended after the packed rows (same order for every member,
    so mixture/conformal row alignment holds)."""
    from ..parallel.train_step import collect_predictions_auto

    if giant_ids:
        from ..parallel.giant import make_giant_collector

        # validates device count too — this path is reachable via resume
        # without train_member's guard (all members already checkpointed)
        gcollect = make_giant_collector(giant, floor)

    means, variances, targets = [], [], None
    for params, mc in zip(members, model_cfgs):
        rows_m, rows_s, rows_y = [], [], []
        if batches:
            mean_z, sigma_z, y, _ = collect_predictions_auto(mc, floor,
                                                             params, batches)
            rows_m.append(mean_z)
            rows_s.append(sigma_z)
            rows_y.append(y)
        if giant_ids:
            gm, gs, gy, _ = gcollect(params, mc, giant_ids)
            rows_m.append(gm)
            rows_s.append(gs)
            rows_y.append(gy)
        mean_z = np.concatenate(rows_m)
        sigma_z = np.concatenate(rows_s)
        means.append(mean_z)
        variances.append(sigma_z ** 2)
        targets = np.concatenate(rows_y)
    return np.stack(means), np.stack(variances), targets


def compute_freq_weights(cfg: TrainConfig, setup: TrainingSetup):
    """Per-graph inverse-frequency loss weights (None when --freq-gamma 0);
    deterministic from (cfg, setup) — shared with `train.member_proc`."""
    if cfg.freq_gamma <= 0.0:
        return None
    from .bins import freq_weights_for_store

    return freq_weights_for_store(setup.store.y, setup.bin_edges,
                                  setup.bin_weights)


def member_plan(cfg: TrainConfig, setup: TrainingSetup, i: int):
    """Everything member i's training needs, derived deterministically from
    (cfg, setup) — shared by the in-process loop and the member subprocess
    (`train.member_proc`) so both paths train the identical member.

    Returns (seed_i, fold_idx, train_i, holdout, model_cfg, member_cfg)."""
    full_train = set(setup.train_idx)
    num_folds = len(setup.folds)
    seed_i = cfg.seed + i * 1007
    fold_idx = i % num_folds
    holdout = setup.folds[fold_idx]
    train_i = sorted(full_train - set(holdout)) if num_folds > 1 \
        else setup.train_idx
    ratio = min(max(cfg.train_subset_ratio, 0.0) or 1.0, 1.0)
    if 0.0 < ratio < 1.0 and train_i:
        rng_sub = np.random.default_rng(seed_i)
        keep = max(1, int(round(len(train_i) * ratio)))
        perm = rng_sub.permutation(len(train_i))[:keep]
        train_i = sorted(train_i[j] for j in np.sort(perm))
    mc = model_config(
        cfg, setup.store,
        hidden=cfg.member_override(cfg.member_hiddens, i, cfg.hidden),
        dropout=cfg.member_override(cfg.member_dropouts, i, cfg.dropout),
        budget=setup.budget)
    member_cfg = dataclasses.replace(
        cfg, lr=float(cfg.member_override(cfg.member_lrs, i, cfg.lr)))
    return seed_i, fold_idx, train_i, holdout, mc, member_cfg


def run_training(cfg: TrainConfig, store: Optional[GraphStore] = None) -> Dict:
    """Full training pipeline; returns summary dict with test stats."""
    t_start = time.time()
    setup = prepare(cfg, store)
    s = setup.store
    save_dir = Path(cfg.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    if cfg.verbose:
        print(f"Dataset: {s.n_graphs} graphs | node_dim={s.node_dim} "
              f"edge_dim={s.edge_dim} angle_dim={s.angle_dim}")
        print(f"Splits: train={len(setup.train_idx)} val={len(setup.val_idx)} "
              f"calib={len(setup.calib_idx)} test={len(setup.test_idx)}")
        print(f"Batch budget: {setup.budget}")

    full_train = set(setup.train_idx)
    num_folds = len(setup.folds)
    members: List[Dict] = []
    model_cfgs: List[AlignnConfig] = []

    # inverse-frequency target-bin loss weights (reference --freq-gamma
    # semantics, train.py:1106,1411-1414): one weight per graph from the
    # train-split bin statistics, grafted onto train batches by the member
    # loop exactly as KNN weights are
    freq_weights = compute_freq_weights(cfg, setup)
    if freq_weights is not None:
        if cfg.verbose:
            tw = freq_weights[np.asarray(setup.train_idx, dtype=np.int64)]
            print(f"[Weights] freq-gamma={cfg.freq_gamma}: bin weights over "
                  f"{len(setup.train_idx)} train samples | "
                  f"mean={tw.mean():.3f} min={tw.min():.3f} max={tw.max():.3f}")

    n_mesh_slots = (max(int(getattr(cfg, "data_shards", 1)), 1)
                    * max(int(getattr(cfg, "edge_shards", 1)), 1))
    if n_mesh_slots > 1 and cfg.member_parallel in ("vmap", "shard"):
        raise ValueError(
            "--data-shards/--edge-shards train each member over a device "
            "mesh and cannot combine with --member-parallel "
            f"'{cfg.member_parallel}' (members would contend for the same "
            "devices). Use sequential members with a mesh, or member "
            "parallelism with single-device members.")
    if cfg.member_parallel in ("vmap", "shard"):
        from ..parallel.ensemble_vmap import train_members_vmapped
        members, model_cfgs = train_members_vmapped(
            setup, cfg, mode=cfg.member_parallel, freq_weights=freq_weights)
        for i, (params, mc) in enumerate(zip(members, model_cfgs)):
            save_member(save_dir / f"model_{i}.npz", params, mc)
    else:
        use_proc = getattr(cfg, "member_isolation", "none") == "process"
        if use_proc and store is not None:
            raise ValueError(
                "member_isolation='process' reloads the dataset from "
                "cfg.data_dir in each member subprocess; an in-memory store "
                "argument cannot be forwarded. Pass store=None.")
        cfg_json_path = None
        if use_proc:
            import json as _json

            # absolutize path-valued fields: the child runs from the package
            # root (see below), not the parent's cwd
            cfg_dict = dataclasses.asdict(cfg)
            for f in ("data_dir", "save_dir", "profile_dir"):
                if cfg_dict.get(f):
                    cfg_dict[f] = str(Path(cfg_dict[f]).resolve())
            cfg_json_path = save_dir / "train_cfg.json"
            cfg_json_path.write_text(_json.dumps(cfg_dict))
        for i in range(cfg.ensemble_size):
            member_path = save_dir / f"model_{i}.npz"
            if cfg.resume and member_path.exists():
                # a member's final artifact exists only after it FINISHED —
                # skipping is the member-level resume (the mid-training
                # resume inside train_member covers partial members)
                try:
                    from .artifacts import load_member

                    params, mc = load_member(member_path)
                    members.append(params)
                    model_cfgs.append(mc)
                    if cfg.verbose:
                        print(f"Member {i + 1}/{cfg.ensemble_size}: loaded "
                              f"finished checkpoint {member_path.name}; "
                              "skipping training (resume)")
                    continue
                except Exception as exc:
                    print(f"Member {i}: existing {member_path.name} "
                          f"unreadable ({exc}); retraining")
            (seed_i, fold_idx, train_i, holdout, mc,
             member_cfg) = member_plan(cfg, setup, i)
            if cfg.verbose:
                print(f"Training ensemble member {i + 1}/{cfg.ensemble_size} "
                      f"(fold {fold_idx + 1}/{num_folds}) with seed {seed_i} | "
                      f"train={len(train_i)} fold_val={len(holdout)}")
            if use_proc:
                # subprocess: the tunneled-client transfer leak (PERF.md
                # round 4) dies with the member's process. The parent must
                # not touch the TPU until all members finish (it hasn't:
                # prepare() is numpy-only), so the chip claim hands off
                # cleanly member to member. The child runs with cwd = the
                # package's parent dir so `python -m gnnep_tpu...` resolves
                # regardless of where the parent was launched (PYTHONPATH is
                # NOT an option: setting it breaks the tunneled TPU plugin's
                # backend registration — PERF.md measurement discipline);
                # path-valued cfg fields were absolutized when the JSON was
                # written. Child stdout streams through the parent's stdout
                # so log capture (Tee/redirect) sees member epochs.
                import subprocess
                import sys as _sys

                pkg_root = Path(__file__).resolve().parents[2]
                proc = subprocess.Popen(
                    [_sys.executable, "-m", "gnnep_tpu.train.member_proc",
                     str(cfg_json_path), str(i)],
                    cwd=pkg_root, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True, bufsize=1)
                for line in proc.stdout:
                    print(line, end="")
                rc = proc.wait()
                if rc != 0:
                    raise RuntimeError(
                        f"member {i} subprocess failed (rc={rc})")
                from .artifacts import load_member

                params, mc = load_member(member_path)
            else:
                params, _ = train_member(s, member_cfg, mc, setup.transformer,
                                         setup.budget, seed_i, train_i,
                                         holdout, freq_weights=freq_weights,
                                         giant=setup.giant)
                save_member(member_path, params, mc)
            members.append(params)
            model_cfgs.append(mc)

    dims = {"node_dim": s.node_dim, "edge_dim": s.edge_dim,
            "angle_dim": s.angle_dim, "global_scalar_dim": s.global_scalar_dim,
            "sg_dim": N_SG_ONE_HOT, "target_dim": s.target_dim,
            "heads": cfg.heads, "seed": cfg.seed, "val_frac": cfg.val_frac,
            "calib_frac": cfg.calib_frac, "test_frac": cfg.test_frac,
            "ensemble_size": cfg.ensemble_size}
    save_scaler_state(save_dir / "scaler_state.npz", setup.scaler,
                      setup.transformer, dims)

    # --- conformal calibration on the dedicated calib split ----------------
    if not setup.calib_idx:
        raise ValueError("Calibration split is empty; set calib_frac > 0 and rerun.")
    calib_norm, calib_giant = (setup.giant.split(setup.calib_idx)
                               if setup.giant else (setup.calib_idx, []))
    calib_batches = (epoch_batches(s, calib_norm, setup.budget, shuffle=False)
                     if calib_norm else [])
    m_means, m_vars, calib_y = collect_ensemble(members, model_cfgs, calib_batches,
                                                cfg.min_logvar_floor,
                                                giant=setup.giant,
                                                giant_ids=calib_giant)
    mean_z, var_z = ensemble_mixture(m_means, m_vars)
    std_z = np.sqrt(var_z)
    target_z = setup.transformer.transform(calib_y)
    a, b = fit_affine_debias(mean_z, target_z)
    mean_z_cal = mean_z * a + b
    conf = conformal_calibration(
        mean_z_cal, std_z if cfg.conformal_method == "scaled" else None,
        calib_y, setup.transformer, cfg.conformal_alpha, cfg.conformal_method)
    save_conformal(save_dir / "conformal.json", conf, a, b)

    if cfg.save_embeddings:
        _save_embeddings(save_dir, members, model_cfgs, s, setup)

    # --- final test report -------------------------------------------------
    summary: Dict = {"members": len(members), "train_time_s": time.time() - t_start}
    if setup.test_idx:
        test_norm, test_giant = (setup.giant.split(setup.test_idx)
                                 if setup.giant else (setup.test_idx, []))
        test_batches = (epoch_batches(s, test_norm, setup.budget,
                                      shuffle=False) if test_norm else [])
        tm, tv, test_y = collect_ensemble(members, model_cfgs, test_batches,
                                          cfg.min_logvar_floor,
                                          giant=setup.giant,
                                          giant_ids=test_giant)
        mean_zt, var_zt = ensemble_mixture(tm, tv)
        mean_zt = mean_zt * a + b
        std_zt = np.sqrt(var_zt)
        mean_orig, lower, upper = apply_conformal_intervals(
            mean_zt, std_zt if cfg.conformal_method == "scaled" else None,
            conf, setup.transformer)
        stats = error_stats(mean_orig, test_y)
        covered = ((test_y >= lower) & (test_y <= upper)).astype(float)
        summary["test_stats"] = stats
        summary["conformal_coverage"] = {
            "per_target": covered.mean(axis=0).tolist(),
            "overall": float(covered.mean()),
            "target": 1.0 - cfg.conformal_alpha,
        }
        if cfg.verbose:
            print("Test diagnostics (ensemble mean):")
            for label, v in stats.items():
                print(f"  {label}: rmse={v['rmse']:.4f}, mae={v['mae']:.4f}, "
                      f"std={v['std']:.4f}, mean_err={v['mean_error']:.4f}")
            print("Conformal PI coverage:")
            for t, c in enumerate(covered.mean(axis=0)):
                print(f"  target_{t}: {c:.4f}")
            print(f"  overall: {covered.mean():.4f} "
                  f"(target={1.0 - cfg.conformal_alpha:.4f})")
    elif cfg.verbose:
        print("No test split; skipping final evaluation.")

    (save_dir / "train_summary.json").write_text(json.dumps(summary, indent=2, default=float))
    return summary


def _save_embeddings(save_dir: Path, members, model_cfgs, store, setup) -> None:
    """Ensemble-mean penultimate embeddings per split (train.py:2125-2131)."""
    import jax

    # ONE jitted embed per distinct member config — a fresh jax.jit wrapper
    # per (batch, member) recompiled the same program hundreds of times
    # (minutes per compile through a remote compile service)
    from .knn_weights import embed_fn

    splits = {"train": setup.train_idx, "val": setup.val_idx,
              "calib": setup.calib_idx, "test": setup.test_idx}
    for name, idx in splits.items():
        if setup.giant is not None:   # giants: no packed embed pass
            idx = setup.giant.split(idx)[0]
        if not idx:
            continue
        batches = epoch_batches(store, idx, setup.budget, shuffle=False)
        accum = []
        for batch in batches:
            zs = [np.asarray(embed_fn(mc)(params, batch))
                  for params, mc in zip(members, model_cfgs)]
            z_mean = np.mean(zs, axis=0)
            accum.append(z_mean[np.asarray(batch.graph_mask) > 0])
        np.savez(save_dir / f"embeddings_{name}.npz", z=np.concatenate(accum))
