"""Single ensemble-member training: epoch loop, best-state selection with the
reference's tie-break cascade, early stopping, optional KNN density weighting.

Selection semantics track `/root/reference/scripts/train.py:1712-1804`
exactly: candidates are epochs whose val MAE is within `delta_mae` of the
global best; ties break by coverage-gap → ECE → Spearman → earlier epoch;
patience counts epochs without a *significant* (> delta_mae_reset) MAE
improvement after a 5-epoch grace period.
"""
from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..data.batching import BatchBudget, epoch_batches
from ..data.store import GraphStore
from ..data.transforms import LogTransformer
from ..models.alignn import AlignnConfig, init_alignn
from .config import TrainConfig
from .knn_weights import compute_knn_weights
from .loop import (TrainHyper, collect_predictions, cosine_lr, make_forward,
                   stack_batches, prng_key,
                   make_train_step, sigma_mask)
from .metrics import eval_metrics

_GRACE_EPOCHS = 5  # reference warmup_epochs for early stopping (train.py:1561)


def _fmt(v: float) -> str:
    if not isinstance(v, (int, float)) or not math.isfinite(float(v)):
        return "n/a"
    return f"{float(v):.4f}"


class BestSelector:
    """Best-epoch bookkeeping with the reference's tie-break cascade."""

    def __init__(self, cfg: TrainConfig):
        self.mae_tie = max(cfg.delta_mae, 0.0)
        self.mae_reset = max(cfg.delta_mae_reset, 0.0)
        self.ece_tie = max(cfg.delta_ece, 0.0)
        self.cov_tie = max(cfg.delta_coverage, 0.0)
        self.coverage_target = 1.0 - cfg.conformal_alpha
        self.best_mae_global = float("inf")
        self.best_mae_reference = float("inf")
        self.best: Optional[Dict[str, float]] = None
        self.best_epoch: Optional[int] = None
        self.significant_improve = False

    def consider(self, epoch: int, m: Dict[str, float]) -> bool:
        mae = m["mae"] if math.isfinite(m["mae"]) else float("inf")
        ece = m["ece"] if math.isfinite(m["ece"]) else float("inf")
        cov = m["coverage"]
        cov_gap = abs(cov - self.coverage_target) if math.isfinite(cov) else float("inf")
        spear = m["spearman"] if math.isfinite(m["spearman"]) else float("-inf")

        if math.isfinite(mae):
            self.best_mae_global = min(self.best_mae_global, mae)
        self.significant_improve = math.isfinite(mae) and (
            not math.isfinite(self.best_mae_reference)
            or (self.best_mae_reference - mae) > self.mae_reset)
        if math.isfinite(mae):
            if self.significant_improve or not math.isfinite(self.best_mae_reference):
                self.best_mae_reference = mae
            else:
                self.best_mae_reference = min(self.best_mae_reference, mae)

        if not (math.isfinite(mae) and mae <= self.best_mae_global + self.mae_tie):
            return False
        update = False
        if self.best is None:
            update = True
        else:
            d = mae - self.best["mae"]
            if d < -self.mae_tie:
                update = True
            elif d > self.mae_tie:
                update = False
            elif cov_gap + self.cov_tie < self.best["cov_gap"]:
                update = True
            elif self.best["cov_gap"] + self.cov_tie < cov_gap:
                update = False
            elif ece + self.ece_tie < self.best["ece"]:
                update = True
            elif self.best["ece"] + self.ece_tie < ece:
                update = False
            elif spear > self.best["spearman"]:
                update = True
            elif spear < self.best["spearman"]:
                update = False
            else:
                update = epoch < (self.best_epoch or epoch)
        if update:
            self.best = {"mae": mae, "ece": ece, "cov_gap": cov_gap,
                         "spearman": spear, **m}
            self.best_epoch = epoch
        return update


def train_member(
    store: GraphStore,
    cfg: TrainConfig,
    model_cfg: AlignnConfig,
    transformer: LogTransformer,
    budget: BatchBudget,
    member_seed: int,
    train_indices: List[int],
    val_indices: List[int],
    freq_weights: Optional[np.ndarray] = None,
    giant=None,
) -> Tuple[Dict, Dict[str, float]]:
    """Train one member; returns (best_params_on_host, best_val_metrics).

    `freq_weights`: optional [n_graphs] per-sample inverse-frequency loss
    weights (active when --freq-gamma > 0; `train.bins.freq_sample_weights`).
    Composed multiplicatively with KNN density weights when both are on.

    `giant`: optional `parallel.giant.GiantSet` — train/val graphs in it
    step through the boundary-exchange partition (its own jitted program
    over the mesh's edge axis, sharing this member's params and optimizer
    state); the rest pack normally. Giant steps run after the packed units
    each epoch, in the epoch's shuffled draw order."""
    hyper = TrainHyper(weight_decay=cfg.weight_decay, log_sigma_l2=cfg.log_sigma_l2,
                       feature_jitter_std=cfg.feature_jitter_std,
                       min_logvar_floor=cfg.min_logvar_floor,
                       optimizer=cfg.optimizer,
                       compute_dtype=cfg.compute_dtype,
                       flat_opt=getattr(cfg, "flat_opt", False))
    scan_k = max(int(getattr(cfg, "scan_steps", 0)), 0)
    multi_step = None
    # --- device mesh (production distributed training) -------------------
    # data_shards × edge_shards > 1 trains this member over a
    # Mesh(("data", "edge")) with the graph-aligned multi-chip step: each
    # optimizer step consumes one SUPER-batch of D·E packed sub-batches
    # (one per device slot), gradients ride a single fused psum, and the
    # update equals the single-device mean-loss gradient over the union
    # batch (gradient-parity-tested). Effective batch per optimizer step is
    # therefore D·E × batch_size graphs. SURVEY.md §2g: the mesh axes are
    # prescribed for *training*, not just benches.
    n_data = max(int(getattr(cfg, "data_shards", 1)), 1)
    n_edge = max(int(getattr(cfg, "edge_shards", 1)), 1)
    n_slots = n_data * n_edge
    mesh = None
    if n_slots > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.train_step import (make_aligned_scan_step,
                                           make_aligned_train_step)

        devs = jax.devices()
        if len(devs) < n_slots:
            raise ValueError(
                f"--data-shards {n_data} × --edge-shards {n_edge} = "
                f"{n_slots} device slots, but only {len(devs)} devices are "
                "visible. Reduce the shard counts or run on a larger slice "
                "(CPU tests: XLA_FLAGS=--xla_force_host_platform_device_"
                f"count={n_slots}).")
        mesh = make_mesh(n_data, n_edge, devices=devs[:n_slots])
        astep, init_opt = make_aligned_train_step(
            mesh, model_cfg, hyper, transformer.means, transformer.stds,
            full_metrics=True)
        # adapt to the single-device calling convention (smask last there)
        step = lambda p, o, sm, b, k, lm, ls: astep(p, o, b, k, lm, ls, sm)
        if scan_k > 1:
            amulti, _ = make_aligned_scan_step(
                mesh, model_cfg, hyper, transformer.means, transformer.stds,
                full_metrics=True)
            multi_step = (lambda p, o, sm, b, k, lm, ls:
                          amulti(p, o, b, k, lm, ls, sm))
    else:
        step, init_opt = make_train_step(model_cfg, hyper,
                                         transformer.means, transformer.stds)
        if scan_k > 1:
            from .loop import make_scan_train_step

            multi_step, _ = make_scan_train_step(model_cfg, hyper,
                                                 transformer.means,
                                                 transformer.stds)
    forward = make_forward(model_cfg, cfg.min_logvar_floor)

    # host→device staging: on the mesh, target the aligned shardings so each
    # sub-batch lands on its owning device slot; single-device keeps the
    # plain async device_put
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..data.batching import GraphBatch
        from ..parallel.mesh import DATA_AXIS, EDGE_AXIS

        _both = P((DATA_AXIS, EDGE_AXIS))
        _unit_shard = GraphBatch(**{
            f: NamedSharding(mesh, _both) for f in GraphBatch._fields})
        _chunk_shard = GraphBatch(**{
            f: NamedSharding(mesh, P(None, (DATA_AXIS, EDGE_AXIS)))
            for f in GraphBatch._fields})
        put_unit = lambda u: jax.device_put(u, _unit_shard)
        put_chunk = lambda c: jax.device_put(c, _chunk_shard)
    else:
        put_unit = jax.device_put
        put_chunk = jax.device_put

    def host_params(p):
        """Host copy for single-device consumers (val forward, KNN embed):
        mesh-sharded params are committed to the mesh's devices and cannot
        mix with device-0 staged batches in a plain jit."""
        return jax.device_get(p) if mesh is not None else p

    # --- giant-graph boundary path (cfg.giant_graphs='boundary') ---------
    # graphs exceeding the batch budget step through the boundary-exchange
    # partition: one shared plan → ONE extra jitted program regardless of
    # how many giants exist; params/optimizer state are shared with the
    # packed-batch steps (identical per-leaf Adam tail)
    g_step = g_fwd = None
    g_n_data = 1
    if giant is not None:
        g_train_all = giant.split(train_indices)[1]
        val_norm, g_val = giant.split(list(val_indices or []))
    else:
        g_train_all, g_val = [], []
        val_norm = list(val_indices or [])
    if g_train_all or g_val:
        if hyper.flat_opt:
            raise ValueError(
                "giant_graphs='boundary' does not compose with --flat-opt: "
                "the boundary step runs the per-leaf optimizer tail and its "
                "state layout must match the packed-batch step's.")
        if mesh is not None and n_edge != giant.n_shards:
            raise ValueError(
                f"GiantSet was planned for {giant.n_shards} edge shards but "
                f"the training mesh has edge axis {n_edge}; re-run prepare "
                "with matching --edge-shards.")
        from ..parallel.mesh import make_mesh
        from ..parallel.train_step import (cached_boundary_forward,
                                           make_boundary_train_step)

        if mesh is not None:
            bmesh = mesh
        else:
            if giant.n_shards > len(jax.devices()):
                raise ValueError(
                    f"giant boundary partition needs {giant.n_shards} "
                    f"devices, have {len(jax.devices())}")
            bmesh = make_mesh(1, giant.n_shards,
                              devices=jax.devices()[:giant.n_shards])
        g_n_data = int(bmesh.devices.shape[0])
        g_step, _ = make_boundary_train_step(
            bmesh, model_cfg, hyper, transformer.means, transformer.stds,
            giant.plan, full_metrics=True)
        g_fwd = cached_boundary_forward(bmesh, model_cfg,
                                        cfg.min_logvar_floor, giant.plan)

    key = prng_key(member_seed, getattr(cfg, "prng_impl", None))
    key, init_key = jax.random.split(key)
    params = init_alignn(init_key, model_cfg)
    opt_state = init_opt(params)
    smask = sigma_mask(params)

    # bootstrap resample with replacement (train.py:1586-1624)
    effective = list(train_indices)
    if cfg.bootstrap and effective:
        ratio = cfg.bootstrap_ratio if cfg.bootstrap_ratio > 0 else 1.0
        count = max(1, int(round(len(effective) * ratio)))
        rng_boot = np.random.default_rng(member_seed)
        effective = rng_boot.choice(np.asarray(effective, dtype=np.int64),
                                    size=count, replace=True).tolist()
        if cfg.verbose:
            print(f"[Bootstrap] Member {member_seed}: sampled {count} / "
                  f"{len(train_indices)} training graphs "
                  f"(ratio={count / max(len(train_indices), 1):.2f})")

    base_lr = cfg.lr
    sigma_base = cfg.sigma_lr_max if cfg.sigma_lr_max > 0 else base_lr
    mean_sched = cosine_lr(cfg.epochs, cfg.warmup_epochs, base_lr, cfg.lr_min)
    sigma_sched = cosine_lr(cfg.epochs, cfg.sigma_warmup_epochs, sigma_base, cfg.lr_min)

    val_batches = epoch_batches(store, val_norm, budget, shuffle=False) \
        if val_norm else []
    selector = BestSelector(cfg)
    best_params = None
    patience = max(cfg.early_stop, 0)
    stale = 0
    start_epoch = 1
    shuffle_rng = np.random.default_rng(member_seed + 17)

    # mid-training resume (framework extension; the reference restarts a
    # crashed member from scratch, SURVEY.md §5)
    from pathlib import Path

    from .artifacts import load_pytree, load_pytree_meta, save_pytree

    resume_path = Path(cfg.save_dir) / f"resume_member_{member_seed}.npz"
    if cfg.resume and resume_path.exists():
        # layout guard BEFORE the fallback try: flat_opt flips the opt_state
        # pytree between a flat vector and per-leaf Adam state; silently
        # restarting from scratch on mismatch would discard real progress
        ck_flat = load_pytree_meta(resume_path).get("flat_opt")
        if ck_flat is not None and bool(ck_flat) != bool(hyper.flat_opt):
            raise RuntimeError(
                f"[Member {member_seed}] resume checkpoint {resume_path} was "
                f"written with flat_opt={bool(ck_flat)} but this run uses "
                f"flat_opt={hyper.flat_opt}; the optimizer-state layouts are "
                "incompatible. Re-run with the matching flat_opt setting, or "
                "delete the resume file to deliberately restart the member.")
        try:
            (params, opt_state, best_tree), meta = load_pytree(
                resume_path, (params, opt_state, params))
            start_epoch = int(meta["epoch"]) + 1
            stale = int(meta["stale"])
            selector.best_mae_global = meta["best_mae_global"]
            selector.best_mae_reference = meta["best_mae_reference"]
            selector.best = meta.get("best") or None
            selector.best_epoch = meta.get("best_epoch")
            if meta.get("has_best"):
                best_params = jax.device_get(best_tree)
            key = prng_key(member_seed + 7919 * start_epoch,
                           getattr(cfg, "prng_impl", None))
            for _ in range(start_epoch - 1):  # keep the shuffle stream aligned
                shuffle_rng.permutation(max(len(effective), 1))
            if cfg.verbose:
                print(f"[Member {member_seed}] resumed at epoch {start_epoch}")
        except Exception as exc:
            print(f"[Member {member_seed}] resume failed ({exc}); starting fresh")

    # KNN density-weighting state (opt-in; reference train.py:1822-1916)
    weights_by_index: Optional[Dict[int, float]] = None
    weights_active_epoch: Optional[int] = None
    last_snapshot_epoch: Optional[int] = None

    from ..utils.profiling import ThroughputMeter, maybe_trace

    t0 = time.time()
    meter = ThroughputMeter()

    # epoch-pipelined packing: epoch N+1's batches assemble on a background
    # thread while the device trains epoch N (host packing otherwise caps
    # TPU throughput — see PERF.md). The shuffle permutation is drawn on the
    # MAIN thread at submit time so the rng stream matches the synchronous
    # loop exactly; per-sample loss weights are grafted on AFTER packing so
    # KNN refreshes never block the prefetch.
    from concurrent.futures import ThreadPoolExecutor

    pack_workers = max(int(getattr(cfg, "pack_workers", 1)), 1)
    pipeline = ThreadPoolExecutor(max_workers=1)

    def submit_pack():
        """(pack_future, epoch_giant_ids): the permutation is drawn on the
        MAIN thread (rng stream identical to the synchronous loop); giants
        ride the same draw — their step order shuffles per epoch without
        consuming extra rng."""
        order = np.asarray(effective, dtype=np.int64)
        order = order[shuffle_rng.permutation(order.size)]
        if giant is not None:
            norm_order, giant_order = giant.split(order.tolist())
        else:
            norm_order, giant_order = order, []
        fut = pipeline.submit(epoch_batches, store, norm_order, budget,
                              shuffle=False, workers=pack_workers)
        return fut, giant_order

    def graft_weights(batches, weight_arr):
        if weight_arr is None:
            return batches
        out = []
        for b in batches:
            idx = np.asarray(b.sample_index)
            w = np.where(idx >= 0, weight_arr[np.maximum(idx, 0)], 0.0)
            out.append(b._replace(weight=w.astype(np.float32)))
        return out

    next_batches, next_giants = submit_pack()
    for epoch in range(start_epoch, cfg.epochs + 1):
        trace_ctx = maybe_trace(cfg.profile_dir if epoch == start_epoch
                                and cfg.profile_dir else None)
        lr_mean = mean_sched(epoch - 1)
        lr_sigma = sigma_sched(epoch - 1)
        use_weights = (cfg.enable_density_weighting and weights_by_index is not None
                       and weights_active_epoch is not None
                       and epoch >= weights_active_epoch)
        weight_arr = None
        if use_weights or freq_weights is not None:
            weight_arr = (np.asarray(freq_weights, dtype=np.float32).copy()
                          if freq_weights is not None
                          else np.ones(store.n_graphs, dtype=np.float32))
            if use_weights:  # compose KNN density × inverse-frequency
                for gi, w in weights_by_index.items():
                    weight_arr[gi] *= w

        batches = graft_weights(next_batches.result(), weight_arr)
        giant_epoch = list(next_giants)
        if epoch < cfg.epochs:
            next_batches, next_giants = submit_pack()
        for b in batches:
            meter.count_batch(b)
        # a training UNIT is one optimizer step's operand: a single batch on
        # one device, or a [D·E, ...]-stacked super-batch on the mesh (the
        # epoch's final super-batch pads short with inert all-masked slots)
        if mesh is not None:
            from ..parallel.train_step import stack_for_mesh

            units = [stack_for_mesh(batches[i:i + n_slots], n_slots)
                     for i in range(0, len(batches), n_slots)]
        else:
            units = batches
        sums = np.zeros(4)  # loss, graphs, abs_err, sq_err
        logvar_sum = 0.0
        n_el = 0.0
        # double-buffered host→device prefetch: device_put is async, so batch
        # i+1 streams in while batch i computes (host↔device bandwidth is a
        # first-class cost on tunneled runtimes — see PERF.md). On the mesh,
        # device_put targets the aligned shardings directly so sub-batches
        # land on their owning devices without a replicate-then-reshard hop.
        with trace_ctx:
            # full K-unit chunks run as ONE lax.scan program (no per-step
            # dispatch or metric readback); the remainder runs per-step.
            # Exact optimizer semantics either way — no padded steps.
            n_scan = (len(units) // scan_k) * scan_k if multi_step else 0
            chunks = ([units[i:i + scan_k] for i in range(0, n_scan, scan_k)]
                      if n_scan else [])
            pending_chunk = (put_chunk(stack_batches(chunks[0]))
                             if chunks else None)
            for ci, chunk in enumerate(chunks):
                stacked = pending_chunk
                if ci + 1 < len(chunks):
                    pending_chunk = put_chunk(stack_batches(chunks[ci + 1]))
                key, chunk_key = jax.random.split(key)
                params, opt_state, ms = multi_step(
                    params, opt_state, smask, stacked, chunk_key,
                    lr_mean, lr_sigma)
                sums += np.array([float(ms.loss_sum.sum()),
                                  float(ms.n_graphs.sum()),
                                  float(ms.abs_err_sum.sum()),
                                  float(ms.sq_err_sum.sum())])
                logvar_sum += float(ms.logvar_sum.sum())
                n_el += float(ms.n_elements.sum())
            rest = units[n_scan:]
            pending = put_unit(rest[0]) if rest else None
            for i, b in enumerate(rest):
                cur = pending
                if i + 1 < len(rest):
                    pending = put_unit(rest[i + 1])
                key, step_key = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, smask, cur,
                                            step_key, lr_mean, lr_sigma)
                sums += np.array([float(m.loss_sum), float(m.n_graphs),
                                  float(m.abs_err_sum), float(m.sq_err_sum)])
                logvar_sum += float(m.logvar_sum)
                n_el += float(m.n_elements)
            # giant graphs: one boundary-partitioned step per group of
            # g_n_data giants (bootstrap duplicates step again)
            if giant_epoch and g_step is not None:
                from ..parallel.train_step import stack_boundary_for_mesh

                for group in giant.groups(giant_epoch, g_n_data, weight_arr):
                    stacked = stack_boundary_for_mesh(group, g_n_data)
                    key, g_key = jax.random.split(key)
                    params, opt_state, m = g_step(params, opt_state, stacked,
                                                  g_key, lr_mean, lr_sigma,
                                                  smask)
                    for bb in group:
                        meter.edges += float(np.asarray(bb.a_mask).sum()
                                             + np.asarray(bb.l_mask).sum())
                        meter.graphs += float(
                            np.asarray(bb.graph_mask).sum())
                    sums += np.array([float(m.loss_sum), float(m.n_graphs),
                                      float(m.abs_err_sum),
                                      float(m.sq_err_sum)])
                    logvar_sum += float(m.logvar_sum)
                    n_el += float(m.n_elements)
        train_loss = sums[0] / max(sums[1], 1.0)
        train_mae = sums[2] / max(sums[1], 1.0)
        train_rmse = math.sqrt(sums[3] / max(n_el, 1.0))
        train_logvar = logvar_sum / max(n_el, 1.0)

        if val_batches or g_val:
            hp = host_params(params)
            parts = []
            if val_batches:
                parts.append(collect_predictions(forward, hp,
                                                 val_batches)[:3])
            if g_val:
                from ..parallel.giant import collect_giant_predictions

                parts.append(collect_giant_predictions(
                    g_fwd, giant, g_val, hp, g_n_data)[:3])
            mean_z, sigma_z, y_val = (np.concatenate([p[i] for p in parts])
                                      for i in range(3))
            vm = eval_metrics(mean_z, sigma_z, y_val, transformer)
        else:
            vm = {"nll": train_loss, "mae": train_mae, "rmse": train_rmse,
                  "mae_log": float("nan"), "coverage": float("nan"),
                  "ece": float("nan"), "spearman": float("nan"),
                  "logvar_mean": train_logvar, "sigma_max": float("nan")}

        if selector.consider(epoch, vm):
            best_params = jax.device_get(params)

        if cfg.verbose:
            print(f"[Member {member_seed}] Epoch {epoch:03d} | "
                  f"train_loss={_fmt(train_loss)} train_mae={_fmt(train_mae)} "
                  f"train_rmse={_fmt(train_rmse)} train_logvar={_fmt(train_logvar)} | "
                  f"val_loss={_fmt(vm['nll'])} val_mae={_fmt(vm['mae'])} "
                  f"val_rmse={_fmt(vm['rmse'])} val_cov={_fmt(vm['coverage'])} "
                  f"val_ece={_fmt(vm['ece'])} val_spear={_fmt(vm['spearman'])}")

        if epoch > _GRACE_EPOCHS:
            if selector.significant_improve:
                stale = 0
            else:
                stale += 1
                if stale >= patience:
                    if cfg.verbose:
                        print(f"Early stopping at epoch {epoch:03d} (mae plateau)")
                    break
        else:
            stale = 0

        if cfg.checkpoint_every > 0 and epoch % cfg.checkpoint_every == 0:
            save_pytree(
                resume_path,
                (params, opt_state, best_params if best_params is not None else params),
                meta={"epoch": epoch, "stale": stale,
                      "best_mae_global": selector.best_mae_global,
                      "best_mae_reference": selector.best_mae_reference,
                      "best": selector.best, "best_epoch": selector.best_epoch,
                      "has_best": best_params is not None,
                      "flat_opt": bool(hyper.flat_opt)})

        # KNN weight refresh after warmup (activated next epoch)
        if cfg.enable_density_weighting and epoch >= cfg.weight_warmup_epochs:
            should = (weights_by_index is None
                      or (cfg.knn_refresh > 0
                          and (last_snapshot_epoch is None
                               or epoch - last_snapshot_epoch >= cfg.knn_refresh)))
            if should:
                # Snapshot UNIQUE train indices: `effective` is the bootstrap
                # resample with duplicates, and duplicated embeddings sit at
                # distance 0 of each other, inflating KNN density (hence
                # down-weighting) for multiply-drawn samples. The reference
                # snapshots the train set once (train.py:930-1010).
                # giants are excluded from the KNN snapshot (their
                # embeddings would need a boundary embed pass); their loss
                # weights stay at the neutral 1.0
                snap_ids = sorted({int(g) for g in effective
                                   if giant is None or g not in giant})
                snap = epoch_batches(store, snap_ids, budget, shuffle=False)
                weights_by_index = compute_knn_weights(
                    model_cfg, host_params(params), snap, store,
                    k=cfg.knn_k, eps=cfg.knn_eps, alpha=cfg.knn_alpha,
                    beta=cfg.knn_beta,
                    clip_min=cfg.knn_weight_min if cfg.knn_weight_min > 0 else None,
                    clip_max=cfg.knn_weight_max if cfg.knn_weight_max > 0 else None)
                last_snapshot_epoch = epoch
                weights_active_epoch = epoch + 1
                # coverage guard before activation (train.py:1874-1903):
                # every effective train id must have a weight — a silent
                # default-to-1.0 would skew the loss unnoticed
                expected = set(snap_ids)
                missing = sorted(expected - set(weights_by_index.keys()))
                if missing:
                    print(f"[Weights] Coverage failure: KNN weights missing "
                          f"{len(missing)} train ids; examples: {missing[:5]}")
                    weights_by_index = None
                    last_snapshot_epoch = None
                    weights_active_epoch = None
                elif getattr(cfg, "knn_coverage_audit", False):
                    total = 0
                    miss = 0
                    max_b = int(getattr(cfg, "knn_coverage_max_batches", 0))
                    for b_idx, b in enumerate(
                            epoch_batches(store, snap_ids, budget,
                                          shuffle=False)):
                        ids = np.asarray(b.sample_index)
                        real = ids[ids >= 0]
                        total += int(real.size)
                        miss += int(sum(1 for ti in real.tolist()
                                        if int(ti) not in weights_by_index))
                        if max_b > 0 and (b_idx + 1) >= max_b:
                            break
                    pct = ((total - miss) / total * 100.0) if total else float("nan")
                    print(f"[Weights] Coverage audit: total={total}, "
                          f"covered={total - miss} ({pct:.2f}%), missing={miss}")
                    if miss > 0:
                        print("[Weights] Coverage failure: audit detected "
                              "missing train ids; skipping activation.")
                        weights_by_index = None
                        last_snapshot_epoch = None
                        weights_active_epoch = None
                if weights_by_index is not None and cfg.verbose:
                    vals = list(weights_by_index.values())
                    print(f"[Weights] Epoch {epoch}: KNN weights for {len(vals)} "
                          f"samples | mean={np.mean(vals):.3f}, "
                          f"min={np.min(vals):.3f}, max={np.max(vals):.3f}")

    pipeline.shutdown(wait=False, cancel_futures=True)
    if best_params is None:
        best_params = jax.device_get(params)
    if resume_path.exists():  # member finished: resume state no longer needed
        try:
            resume_path.unlink()
        except OSError:
            pass
    best_metrics = dict(selector.best or {})
    if cfg.verbose and selector.best is not None:
        print(f"[Member {member_seed}] Best epoch {selector.best_epoch:03d} | "
              f"val_mae={_fmt(best_metrics['mae'])} "
              f"val_cov={_fmt(best_metrics.get('coverage', float('nan')))} "
              f"val_ece={_fmt(best_metrics['ece'])} | "
              f"throughput: {meter.summary()} | time={time.time() - t0:.1f}s")
    return best_params, best_metrics
