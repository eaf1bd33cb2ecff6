"""Member-parallel ensemble training: vmap (one device) or shard_map (one
member per device).

The reference trains its 5 members strictly sequentially
(`/root/reference/scripts/train.py:2052-2095`). On TPU the members are
embarrassingly parallel: with homogeneous architectures we stack parameters
along a leading member axis and run ONE jitted step across members, each
member consuming its own bootstrap batch stream — the ensemble-axis
parallelism called for by the north star (SURVEY.md §2g). Two executions of
the same driver:

- ``vmap``: members batched on ONE device (M× arithmetic intensity). vmapping
  `pallas_call` is unsupported, so this mode downgrades `conv_impl='fused'`
  to the XLA table path.
- ``shard``: a `Mesh(("member",))` places one member per device via
  `shard_map`; each device runs the full LOCAL train step — including the
  fused Pallas kernels — with zero cross-member communication. This is the
  pod-scale mode: 5 members train simultaneously at single-member step time.

Early stopping runs per-member on the host: a member whose patience has
expired keeps computing (lock-step) but its parameter snapshot is frozen, so
selection semantics match sequential training; the wall-clock cost is the
slowest member, not the sum.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import epoch_batches
from ..models.alignn import AlignnConfig, init_alignn
from ..train.config import TrainConfig
from ..train.loop import (TrainHyper, collect_predictions, cosine_lr,
                          make_forward, prng_key, sigma_mask)
from ..train.member import BestSelector
from ..train.metrics import eval_metrics


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_tree(tree, m: int):
    return [jax.tree.map(lambda x, i=i: np.asarray(x[i]), tree) for i in range(m)]


def train_members_vmapped(setup, cfg: TrainConfig, mode: str = "vmap",
                          freq_weights=None
                          ) -> Tuple[List[Dict], List[AlignnConfig]]:
    if cfg.member_hiddens is not None and len(set(cfg.member_hiddens)) > 1:
        raise ValueError(f"{mode} member-parallel training requires homogeneous "
                         "hidden sizes; use member_parallel='sequential'.")
    if cfg.enable_density_weighting:
        raise ValueError(f"KNN density weighting is not supported in {mode} "
                         "mode; use member_parallel='sequential'.")
    from ..train.ensemble import model_config  # late import (cycle)

    s = setup.store
    m = cfg.ensemble_size
    # inverse-frequency bin weights ride the packer's weights= path (the
    # same composition point the sequential loop grafts onto batches);
    # run_training passes its precomputed array — recompute only when
    # called directly
    if freq_weights is None and cfg.freq_gamma > 0.0:
        from ..train.bins import freq_weights_for_store
        freq_weights = freq_weights_for_store(s.y, setup.bin_edges,
                                              setup.bin_weights)
    mesh = None
    if mode == "shard":
        devices = jax.devices()
        if m > len(devices):
            raise ValueError(
                f"member_parallel='shard' places one member per device: "
                f"{m} members > {len(devices)} devices. Use 'vmap' or "
                "'sequential'.")
        mesh = jax.sharding.Mesh(np.array(devices[:m]), ("member",))
    num_folds = len(setup.folds)
    full_train = set(setup.train_idx)
    hidden = cfg.member_hiddens[0] if cfg.member_hiddens else cfg.hidden
    # per-member dropout rides in as a traced [M] vector (one rate per
    # member slot) so heterogeneous rates still compile exactly once
    dropouts = [float(cfg.member_override(cfg.member_dropouts, i, cfg.dropout))
                for i in range(m)]
    lrs = [float(cfg.member_override(cfg.member_lrs, i, cfg.lr)) for i in range(m)]

    mc = model_config(cfg, s, hidden=hidden, dropout=dropouts[0],
                      budget=setup.budget)
    if mc.conv_impl == "fused" and mode == "vmap":
        # vmapping pallas_call across the member axis is not supported;
        # the XLA table path vmaps cleanly. (shard mode keeps the fused
        # kernels: each device runs a full local step.)
        import dataclasses as _dc
        import warnings

        warnings.warn(
            "--member-parallel vmap cannot vmap the fused Pallas kernels "
            "across members; training runs on the dense-table path (~10x "
            "slower per step on TPU). Use --member-parallel shard (one "
            "member per device, kernels intact) or sequential members when "
            "single-device throughput matters.")
        mc = _dc.replace(mc, conv_impl="table")
    hyper = TrainHyper(weight_decay=cfg.weight_decay, log_sigma_l2=cfg.log_sigma_l2,
                       feature_jitter_std=cfg.feature_jitter_std,
                       min_logvar_floor=cfg.min_logvar_floor)

    seeds = [cfg.seed + i * 1007 for i in range(m)]
    _impl = getattr(cfg, "prng_impl", None)
    member_params = [init_alignn(jax.random.fold_in(prng_key(sd, _impl), 0), mc)
                     for sd in seeds]
    params = _stack_trees(member_params)
    smask = sigma_mask(member_params[0])

    import optax

    from ..train.loop import hetero_nll
    adam = optax.scale_by_adam()
    opt_state = adam.init(params)
    mu = jnp.asarray(setup.transformer.means, dtype=jnp.float32)
    sd_ = jnp.asarray(setup.transformer.stds, dtype=jnp.float32)

    def one_member_grads(p, batch, rng, drop_rate):
        y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd_

        def loss_fn(pp):
            loss, aux = hetero_nll(pp, mc, hyper, batch, y_z, rng, train=True,
                                   dropout_override=drop_rate)
            return loss, aux

        (_, (mean, logvar, sample_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        stats = jnp.array([sample_loss.sum(), batch.graph_mask.sum()])
        return grads, stats

    def _stacked_body(params, opt_state, batches, rngs, lr_vec, drop_vec, *,
                      member_fn):
        grads, stats = member_fn(params, batches, rngs, drop_vec)
        updates, opt_state = adam.update(grads, opt_state, params)
        wd = hyper.weight_decay

        def apply_leaf(u, p, is_sigma_leaf):
            # lr_vec: [M, 2] — column 0 mean lr, column 1 sigma lr
            lr = jnp.where(is_sigma_leaf, lr_vec[:, 1], lr_vec[:, 0])
            lr = lr.reshape((-1,) + (1,) * (p.ndim - 1))
            return p - lr * (u + wd * p)

        params = jax.tree.map(
            lambda u, p, ms: apply_leaf(u, p, ms), updates, params,
            jax.tree.map(lambda b: jnp.asarray(b), smask))
        return params, opt_state, stats

    if mode == "vmap":
        stacked_step = jax.jit(partial(_stacked_body,
                                       member_fn=jax.vmap(one_member_grads)))
    else:
        from jax.sharding import PartitionSpec as P

        from .mesh import shard_map

        # one member per device: the WHOLE stacked step runs under shard_map
        # with every stacked leaf split on the member axis, so each device
        # executes a plain local (size-1) step — Pallas kernels included —
        # with no cross-member communication at all
        def local_grads(params, batches, rngs, drop_vec):
            sq = lambda t: jax.tree.map(lambda x: x[0], t)
            g, st = one_member_grads(sq(params), sq(batches), rngs[0],
                                     drop_vec[0])
            ex = lambda t: jax.tree.map(lambda x: x[None], t)
            return ex(g), st[None]

        def sharded_body(params, opt_state, batches, rngs, lr_vec, drop_vec):
            return _stacked_body(params, opt_state, batches, rngs, lr_vec,
                                 drop_vec, member_fn=local_grads)

        spec = P("member")
        # Adam state carries a scalar step count — replicated, not sharded
        opt_spec = jax.tree.map(
            lambda x: spec if np.ndim(x) > 0 else P(), opt_state)
        stacked_step = jax.jit(shard_map(
            sharded_body, mesh=mesh,
            in_specs=(spec, opt_spec, spec, spec, spec, spec),
            out_specs=(spec, opt_spec, spec),
            check=False))

    # per-member data streams (bootstrap + fold assignment, as sequential)
    member_train_idx: List[List[int]] = []
    for i in range(m):
        fold_idx = i % num_folds
        train_i = sorted(full_train - set(setup.folds[fold_idx])) \
            if num_folds > 1 else list(setup.train_idx)
        if cfg.bootstrap and train_i:
            ratio = cfg.bootstrap_ratio if cfg.bootstrap_ratio > 0 else 1.0
            count = max(1, int(round(len(train_i) * ratio)))
            rng_boot = np.random.default_rng(seeds[i])
            train_i = rng_boot.choice(np.asarray(train_i, dtype=np.int64),
                                      size=count, replace=True).tolist()
        member_train_idx.append(train_i)

    mean_sched = cosine_lr(cfg.epochs, cfg.warmup_epochs, 1.0, cfg.lr_min / cfg.lr)
    sigma_base = cfg.sigma_lr_max if cfg.sigma_lr_max > 0 else cfg.lr
    sigma_sched = cosine_lr(cfg.epochs, cfg.sigma_warmup_epochs, 1.0,
                            cfg.lr_min / sigma_base)

    forward = make_forward(mc, cfg.min_logvar_floor)
    selectors = [BestSelector(cfg) for _ in range(m)]
    best_params: List[Dict] = [None] * m  # type: ignore[list-item]
    stale = [0] * m
    stopped = [False] * m
    patience = max(cfg.early_stop, 0)
    shuffle_rngs = [np.random.default_rng(sd + 17) for sd in seeds]
    keys = [prng_key(sd + 1, _impl) for sd in seeds]
    val_batches = [epoch_batches(s, setup.folds[i % num_folds], setup.budget,
                                 shuffle=False) for i in range(m)]

    for epoch in range(1, cfg.epochs + 1):
        lr_vec = np.stack([
            [lrs[i] * mean_sched(epoch - 1), sigma_base * sigma_sched(epoch - 1)]
            for i in range(m)]).astype(np.float32)
        streams = [epoch_batches(s, member_train_idx[i], setup.budget,
                                 shuffle=True, rng=shuffle_rngs[i],
                                 weights=freq_weights,
                                 workers=getattr(cfg, "pack_workers", 1))
                   for i in range(m)]
        n_steps = min(len(st) for st in streams)
        loss_sums = np.zeros(m)
        graph_sums = np.zeros(m)

        def stack_at(t):
            return jax.device_put(jax.tree.map(
                lambda *xs: np.stack(xs), *[streams[i][t] for i in range(m)]))

        pending = stack_at(0) if n_steps else None
        for t in range(n_steps):
            batch_stack = pending
            if t + 1 < n_steps:
                pending = stack_at(t + 1)  # async host→device prefetch
            step_keys = []
            for i in range(m):
                keys[i], k = jax.random.split(keys[i])
                step_keys.append(k)
            params, opt_state, stats = stacked_step(
                params, opt_state, batch_stack, jnp.stack(step_keys),
                jnp.asarray(lr_vec),
                jnp.asarray(dropouts, dtype=jnp.float32))
            stats = np.asarray(stats)
            loss_sums += stats[:, 0]
            graph_sums += stats[:, 1]

        members_now = _unstack_tree(params, m)
        all_stopped = True
        for i in range(m):
            if stopped[i]:
                continue
            mean_z, sigma_z, y_val, _ = collect_predictions(
                forward, members_now[i], val_batches[i])
            vm = eval_metrics(mean_z, sigma_z, y_val, setup.transformer)
            if selectors[i].consider(epoch, vm):
                best_params[i] = members_now[i]
            if epoch > 5:
                if selectors[i].significant_improve:
                    stale[i] = 0
                else:
                    stale[i] += 1
                    if stale[i] >= patience:
                        stopped[i] = True
            if not stopped[i]:
                all_stopped = False
            if cfg.verbose:
                print(f"[vmap member {i}] epoch {epoch:03d} "
                      f"train_loss={loss_sums[i] / max(graph_sums[i], 1):.4f} "
                      f"val_mae={vm['mae']:.4f} val_ece={vm['ece']:.4f}"
                      + (" [stopped]" if stopped[i] else ""))
        if all_stopped:
            break

    members_now = _unstack_tree(params, m)
    out = [bp if bp is not None else members_now[i] for i, bp in enumerate(best_params)]
    return out, [mc] * m
