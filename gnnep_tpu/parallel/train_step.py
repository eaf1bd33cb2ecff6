"""Multi-chip training steps: data parallelism × edge partitioning via shard_map.

Two formulations over a `Mesh(("data", "edge"))`:

1. **Graph-aligned (production fast path)** — `make_aligned_train_step`.
   The packed batch is block-diagonal, so partitioning its edge/LG arenas at
   graph boundaries is the min-cut edge partition (cut = 0): each device
   consumes a complete CSR sub-arena (own dense tables, row pointers, win64
   bounds) and runs the unmodified fused-kernel forward; the only
   collective is one fused grads+loss+count psum per step. Per-chip
   throughput equals the single-device fused step by construction.

2. **General edge-sharded (giant-graph fallback)** —
   `make_sharded_train_step`. Edge/LG arenas split mid-segment across the
   edge axis with replicated states and per-conv pmax/psum combines (see
   `edge_shard.py`) — the COO formulation that stays correct when a single
   graph's edges exceed one chip. Slower per chip; use only when a graph
   cannot be packed whole.

Both compute sum-form losses per device, psum gradients, and normalize by
the global real-graph count — exactly the single-device mean-loss gradient.
The AdamW update runs replicated, so params and optimizer state never need
resharding.

Batch staging: `stack_for_mesh(batches, n_slots)` stacks per-rank batches
into a leading-axis super-batch (n_slots = D for the general formulation's
data ranks, D·E sub-batch slots for the aligned one).
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..data.batching import GraphBatch
from ..models.alignn import AlignnConfig
from ..train.loop import TrainHyper, nll_loss_sums
from .edge_shard import sharded_apply
from .mesh import DATA_AXIS, EDGE_AXIS, shard_map

# per-field sharding: which mesh axes the *leading* array axis is split over.
# (arrays are stacked with a leading data-rank axis; edge/LG arenas shard
# their second axis across the edge axis)
_EDGE_FIELDS = {"edge_src", "edge_dst", "edge_attr", "edge_mask",
                "lg_src", "lg_dst", "lg_attr", "lg_mask",
                "edge_table_pos", "lg_in_edges", "lg_in_mask", "lg_table_pos",
                "lg_out_edges", "lg_out_mask", "edge_src_order",
                "lg_src_order", "lg_src_starts"}


def batch_pspecs() -> GraphBatch:
    """PartitionSpecs for a leading-data-axis stacked GraphBatch."""
    specs = {}
    for field in GraphBatch._fields:
        if field in _EDGE_FIELDS:
            specs[field] = P(DATA_AXIS, EDGE_AXIS)
        else:
            specs[field] = P(DATA_AXIS)
    return GraphBatch(**specs)


def stack_for_mesh(batches: List[GraphBatch], n_data: int) -> GraphBatch:
    """Stack `n_data` same-budget batches into one [D, ...] super-batch.

    If fewer batches than data ranks are supplied, empty (fully padded)
    batches pad the stack — their graph_mask is all zero so they contribute
    nothing to loss or gradients.
    """
    if len(batches) > n_data:
        raise ValueError(f"got {len(batches)} batches for {n_data} data ranks")
    pads = []
    if len(batches) < n_data:
        proto = batches[0]
        empty = GraphBatch(*[np.zeros_like(np.asarray(f)) for f in proto])
        dummy_node = proto.nodes.shape[0] - 1
        dummy_edge = proto.edge_src.shape[0] - 1
        dummy_lg = proto.lg_src.shape[0] - 1
        n_tab = np.asarray(proto.node_in_edges)
        l_tab = np.asarray(proto.lg_in_edges)
        empty = empty._replace(
            edge_src=np.full_like(np.asarray(proto.edge_src), dummy_node),
            edge_dst=np.full_like(np.asarray(proto.edge_dst), dummy_node),
            lg_src=np.full_like(np.asarray(proto.lg_src), dummy_edge),
            lg_dst=np.full_like(np.asarray(proto.lg_dst), dummy_edge),
            node_graph=np.full_like(np.asarray(proto.node_graph),
                                    proto.y.shape[0]),
            y=np.ones_like(np.asarray(proto.y)),
            sample_index=np.full_like(np.asarray(proto.sample_index), -1),
            node_in_edges=np.full_like(n_tab, dummy_edge),
            edge_table_pos=np.full_like(np.asarray(proto.edge_table_pos),
                                        n_tab.shape[0] * n_tab.shape[1] - 1),
            lg_in_edges=np.full_like(l_tab, dummy_lg),
            lg_table_pos=np.full_like(np.asarray(proto.lg_table_pos),
                                      l_tab.shape[0] * l_tab.shape[1] - 1),
            node_out_edges=np.full_like(np.asarray(proto.node_out_edges),
                                        dummy_edge),
            lg_out_edges=np.full_like(np.asarray(proto.lg_out_edges), dummy_lg),
            edge_src_order=np.tile(np.arange(dummy_edge + 1, dtype=np.int32),
                                   1),
            lg_src_order=np.tile(np.arange(dummy_lg + 1, dtype=np.int32), 1),
            edge_src_starts=np.zeros_like(np.asarray(proto.edge_src_starts)),
            lg_src_starts=np.zeros_like(np.asarray(proto.lg_src_starts)))
        pads = [empty] * (n_data - len(batches))
    stacked = [np.stack([np.asarray(getattr(b, f)) for b in [*batches, *pads]])
               for f in GraphBatch._fields]
    return GraphBatch(*stacked)


def measure_table_widths(batches: List[GraphBatch]) -> tuple:
    """(atom_w, lg_w): max CSR row span over REAL rows of every batch —
    the static table widths for the edge-sharded convs' scatter-free
    implicit-table formulation. Measured on staged host batches (the dummy
    row's tail-padding span is excluded; its entries are clamped in-kernel
    and provably carry zero cotangent). Covers diluted batches too, since
    row pointers already include interleaved padding rows."""
    aw = lw = 1
    for b in batches:
        e_rp = np.asarray(b.edge_row_ptr, dtype=np.int64)
        l_rp = np.asarray(b.lg_row_ptr, dtype=np.int64)
        if e_rp.size > 2:
            aw = max(aw, int(np.diff(e_rp)[:-1].max()))
        if l_rp.size > 2:
            lw = max(lw, int(np.diff(l_rp)[:-1].max()))
    return aw, lw


def measure_row_windows(batches: List[GraphBatch], n_edge_shards: int
                        ) -> tuple:
    """(atom_R, lg_R): static per-rank aggregation-row window sizes for the
    edge-sharded windowed formulation's compute scaling — the max number of
    target rows (128-aligned start, rounded up to 128) that any rank's
    CSR-contiguous edge slice touches, over every batch and shard. With
    them, each rank's windowed reductions run on [R] rows instead of all N
    (see `edge_shard._windowed_conv`)."""
    aw = lw = 128
    for b in batches:
        s = max(int(n_edge_shards), 1)
        for which, rp, e_arena, n_rows in (
                ("atom", np.asarray(b.edge_row_ptr, np.int64),
                 b.edge_src.shape[0], b.nodes.shape[0]),
                ("lg", np.asarray(b.lg_row_ptr, np.int64),
                 b.lg_src.shape[0], b.edge_src.shape[0])):
            e_loc = e_arena // s
            for r in range(s):
                e0, e1 = r * e_loc, (r + 1) * e_loc
                lo = max(int(np.searchsorted(rp, e0, side="right")) - 1, 0)
                lo = (lo // 128) * 128
                hi = max(int(np.searchsorted(rp, e1 - 1, side="right")) - 1,
                         lo)
                R = ((hi - lo) // 128 + 1) * 128
                R = min(R, n_rows)
                if which == "atom":
                    aw = max(aw, R)
                else:
                    lw = max(lw, R)
    return aw, lw


def make_sharded_train_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                            log_means: np.ndarray, log_stds: np.ndarray,
                            comm_chunks: int = 4,
                            table_widths: tuple | None = None,
                            impl: str | None = None,
                            row_windows: tuple | None = None):
    """Build the jitted multi-chip train step + optimizer init.

    `comm_chunks` pipelines each conv's all-reduce against its row-local
    epilogue (see edge_shard.edge_sharded_conv) — outputs are
    chunk-count-invariant, so the default of 4 only changes scheduling.

    `table_widths=(atom_w, lg_w)` (from `measure_table_widths` over the
    staged batches) switches the per-conv local reductions to the
    scatter-free implicit-table formulation — substantially faster on TPU
    than the default COO segment ops (whose backward scatter-adds execute
    row-serially); None keeps COO."""
    adam = optax.scale_by_adam()
    mu = jnp.asarray(log_means, dtype=jnp.float32)
    sd = jnp.asarray(log_stds, dtype=jnp.float32)
    specs = batch_pspecs()

    def local_loss(params, batch, rng):
        """Sum-form loss on this device's (data-shard, edge-shard)."""
        if hyper.feature_jitter_std > 0.0 and rng is not None:
            rng, kx, kg = jax.random.split(rng, 3)
            batch = batch._replace(
                nodes=batch.nodes + hyper.feature_jitter_std
                * jax.random.normal(kx, batch.nodes.shape),
                globals_=batch.globals_ + hyper.feature_jitter_std
                * jax.random.normal(kg, batch.globals_.shape))
        mean, logvar = sharded_apply(params, cfg, batch, axis_name=EDGE_AXIS,
                                     train=True, rng=rng,
                                     comm_chunks=comm_chunks,
                                     table_widths=table_widths, impl=impl,
                                     row_windows=row_windows)
        loss_sum, sample_sum, n_real = nll_loss_sums(mean, logvar, batch,
                                                     mu, sd, hyper)
        return loss_sum, (sample_sum, n_real)

    def device_step(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        # strip the leading data-rank axis (local block size 1)
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        (_, (loss_sum, n_local)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, batch, rng)
        # Edge-axis aggregation must be pmean: the VJP of the forward psums
        # re-psums cotangents, so each edge-rank's grad holds n×(its sharded-
        # path contribution) + 1×(the replicated path); averaging over ranks
        # yields exactly Σ sharded paths + replicated path. The data axis is
        # a plain sum, then normalize by the global real-graph count.
        grads = jax.lax.pmean(grads, EDGE_AXIS)
        grads = jax.lax.psum(grads, DATA_AXIS)
        n_global = jnp.maximum(jax.lax.psum(n_local, DATA_AXIS), 1.0)
        grads = jax.tree.map(lambda g: g / n_global, grads)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = adam.update(grads, opt_state, params)
        wd = hyper.weight_decay

        def apply_leaf(u, p, is_sigma):
            lr = jnp.where(is_sigma, lr_sigma, lr_mean)
            return p - lr * (u + wd * p)

        params = jax.tree.map(apply_leaf, updates, params,
                              jax.tree.map(jnp.asarray, smask))
        loss_total = jax.lax.psum(loss_sum, DATA_AXIS)
        return params, opt_state, loss_total / n_global, n_global

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), specs, P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        return sharded(params, opt_state, batch, rng, lr_mean, lr_sigma, smask)

    return step, (lambda params: adam.init(params))


def aligned_pspecs() -> GraphBatch:
    """PartitionSpecs for the graph-aligned layout: every field of the
    [D·E, ...]-stacked super-batch shards jointly over (data, edge)."""
    both = P((DATA_AXIS, EDGE_AXIS))
    return GraphBatch(**{f: both for f in GraphBatch._fields})


def make_aligned_train_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                            log_means: np.ndarray, log_stds: np.ndarray,
                            full_metrics: bool = False):
    """Graph-aligned multi-chip train step → (step, init_opt). See
    `_aligned_parts` for the design notes.

    `full_metrics=True` changes the step's return to
    `(params, opt_state, StepMetrics)` with globally psum'd sums — the same
    shape the single-device `make_train_step` returns, so the production
    trainer (`train/member.py`) consumes either step interchangeably."""
    step, init_opt, _, _ = _aligned_parts(mesh, cfg, hyper, log_means,
                                          log_stds,
                                          full_metrics=full_metrics)
    return step, init_opt


def _aligned_parts(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                   log_means: np.ndarray, log_stds: np.ndarray,
                   full_metrics: bool = False):
    """Graph-aligned multi-chip train step — the production fast path.

    A packed batch is a block-diagonal graph, so partitioning its edge and
    line-graph arenas AT GRAPH BOUNDARIES is the min-cut edge partition
    (cut = 0): every aggregation segment is rank-local, each rank's shard is
    a complete dst-sorted CSR sub-arena carrying its own dense tables, row
    pointers, and win64 bounds, and the fused Pallas kernels run unmodified
    inside shard_map. The per-layer boundary exchange of the general
    formulation (`edge_shard.py`, for graphs larger than a chip) is empty by
    construction — the only collectives are ONE fused grads+loss+count psum
    per step over the whole mesh, so per-chip throughput equals the
    single-device fused step and scaling efficiency is communication-bound
    only by the gradient all-reduce.

    The mesh's (data × edge) grid is consumed as a flat pool of D·E
    sub-batch slots; stack sub-batches with `stack_for_mesh(batches, D·E)`.
    Gradients are normalized by the GLOBAL real-graph count — exactly the
    single-device mean-loss gradient over the union batch.
    """
    from ..train.loop import _cast_for_compute

    adam = optax.scale_by_adam()
    mu = jnp.asarray(log_means, dtype=jnp.float32)
    sd = jnp.asarray(log_stds, dtype=jnp.float32)
    specs = aligned_pspecs()
    dtype = jnp.bfloat16 if hyper.compute_dtype == "bfloat16" else jnp.float32

    from ..train.loop import StepMetrics

    def local_loss(params, batch, rng):
        """Sum-form loss on this device's sub-batch (standard forward)."""
        kd = rng
        if hyper.feature_jitter_std > 0.0 and rng is not None:
            rng, kx, kg, kd = jax.random.split(rng, 4)
            batch = batch._replace(
                nodes=batch.nodes + hyper.feature_jitter_std
                * jax.random.normal(kx, batch.nodes.shape),
                globals_=batch.globals_ + hyper.feature_jitter_std
                * jax.random.normal(kg, batch.globals_.shape))
        from ..models.alignn import alignn_apply

        c_params, c_batch = _cast_for_compute(params, batch, dtype)
        mean, logvar = alignn_apply(c_params, cfg, c_batch, train=True, rng=kd)
        loss_sum, sample_sum, n_real = nll_loss_sums(mean, logvar, batch,
                                                     mu, sd, hyper)
        if not full_metrics:
            return loss_sum, (sample_sum, n_real)
        # local StepMetrics sums (same fields as the single-device step body
        # in train/loop._make_step_body: y_mask-valid error diagnostics)
        # RAW logvar, matching the single-device step body's diagnostics
        # (train/loop._make_step_body) — mesh and single-device members must
        # report comparable train_logvar/max_var even when the floor binds
        lv = logvar.astype(jnp.float32)
        pred = jnp.exp(mean.astype(jnp.float32) * sd + mu)
        el_mask = batch.graph_mask[:, None] * batch.y_mask
        err = (pred - batch.y) * el_mask
        local_m = StepMetrics(
            loss_sum=sample_sum, n_graphs=n_real,
            abs_err_sum=jnp.abs(err).sum(), sq_err_sum=(err ** 2).sum(),
            n_elements=el_mask.sum(), logvar_sum=(lv * el_mask).sum(),
            max_var=jnp.max(jnp.exp(lv) * batch.graph_mask[:, None]))
        return loss_sum, (sample_sum, n_real, local_m)

    from jax.flatten_util import ravel_pytree

    def device_body(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        """One optimizer step on an already-local sub-batch (inside
        shard_map). Same clip/Adam/update tail as the single-device step
        (see train/loop._make_step_body): per-leaf by default, raveled
        flat-vector under hyper.flat_opt."""
        (_, aux), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, batch, rng)
        if full_metrics:
            loss_sum, n_local, local_m = aux
            # one fused all-reduce: grads + every metric sum ride one psum;
            # max_var is the only max-combined field
            grads, loss_total, n_global, m_sums = jax.lax.psum(
                (grads, loss_sum, n_local,
                 local_m._replace(max_var=jnp.zeros(()))),
                (DATA_AXIS, EDGE_AXIS))
            metrics = m_sums._replace(max_var=jax.lax.pmax(
                local_m.max_var, (DATA_AXIS, EDGE_AXIS)))
        else:
            loss_sum, n_local = aux
            # one fused all-reduce: grads + loss + count ride a single psum
            grads, loss_total, n_global = jax.lax.psum(
                (grads, loss_sum, n_local), (DATA_AXIS, EDGE_AXIS))
            metrics = None
        n_global = jnp.maximum(n_global, 1.0)
        if hyper.flat_opt:
            flat_g, _ = ravel_pytree(grads)
            flat_p, unravel = ravel_pytree(params)
            sigma_flat, _ = ravel_pytree(
                jax.tree.map(
                    lambda p, m: jnp.broadcast_to(jnp.asarray(m), p.shape),
                    params, smask))
            flat_g = flat_g / n_global
            gnorm = jnp.sqrt(jnp.sum(flat_g * flat_g))
            scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
            flat_g = flat_g * scale
            if hyper.optimizer == "adam":
                flat_g = flat_g + hyper.weight_decay * flat_p
                wd = 0.0
            else:
                wd = hyper.weight_decay
            updates, opt_state = adam.update(flat_g, opt_state, flat_p)
            lr = jnp.where(sigma_flat, lr_sigma, lr_mean)
            params = unravel(flat_p - lr * (updates + wd * flat_p))
        else:
            grads = jax.tree.map(lambda g: g / n_global, grads)
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
            if hyper.optimizer == "adam":
                grads = jax.tree.map(lambda g, p: g + hyper.weight_decay * p,
                                     grads, params)
                wd = 0.0
            else:
                wd = hyper.weight_decay
            updates, opt_state = adam.update(grads, opt_state, params)

            def apply_leaf(u, p, is_sigma):
                lr = jnp.where(is_sigma, lr_sigma, lr_mean)
                return p - lr * (u + wd * p)

            params = jax.tree.map(apply_leaf, updates, params,
                                  jax.tree.map(jnp.asarray, smask))
        if full_metrics:
            return params, opt_state, metrics
        return params, opt_state, loss_total / n_global, n_global

    def device_step(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        batch = jax.tree.map(lambda x: x[0], batch)   # local block size 1
        rng = jax.random.fold_in(rng,
                                 jax.lax.axis_index((DATA_AXIS, EDGE_AXIS)))
        return device_body(params, opt_state, batch, rng, lr_mean, lr_sigma,
                           smask)

    out_specs = (P(), P(), P()) if full_metrics else (P(), P(), P(), P())
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), specs, P(), P(), P(), P()),
        out_specs=out_specs,
        check=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        return sharded(params, opt_state, batch, rng, lr_mean, lr_sigma, smask)

    def init_opt(params):
        return adam.init(ravel_pytree(params)[0]) if hyper.flat_opt \
            else adam.init(params)

    return step, init_opt, device_body, specs


def make_aligned_scan_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                           log_means: np.ndarray, log_stds: np.ndarray,
                           full_metrics: bool = False):
    """Scan-over-steps variant of the aligned step: ONE jitted program runs
    K optimizer steps over a [K, D·E, ...]-stacked super-batch pytree
    (lax.scan inside shard_map). The multi-chip analogue of
    `train.loop.make_scan_train_step` — the host leaves the inner loop, so
    timings measure the chips, not the dispatch tunnel.

    `full_metrics=True` returns `(params, opt_state, StepMetrics)` with
    [K]-stacked globally-reduced sums, matching `make_scan_train_step`."""
    _, init_opt, device_body, specs = _aligned_parts(
        mesh, cfg, hyper, log_means, log_stds, full_metrics=full_metrics)
    # leading K axis is unsharded; per-field slot axis sharding shifts right
    scan_specs = jax.tree.map(lambda s: P(None, *s), specs)

    def device_multi(params, opt_state, stacked, rng, lr_mean, lr_sigma,
                     smask):
        local = jax.tree.map(lambda x: x[:, 0], stacked)   # [K, ...]
        n_steps = jax.tree.leaves(local)[0].shape[0]
        rng = jax.random.fold_in(rng,
                                 jax.lax.axis_index((DATA_AXIS, EDGE_AXIS)))
        keys = jax.random.split(rng, n_steps)

        def f(carry, xs):
            p, o = carry
            b, k = xs
            out = device_body(p, o, b, k, lr_mean, lr_sigma, smask)
            if full_metrics:
                p, o, m = out
                return (p, o), m
            p, o, loss, n = out
            return (p, o), (loss, n)

        (params, opt_state), ys = jax.lax.scan(
            f, (params, opt_state), (local, keys))
        if full_metrics:
            return params, opt_state, ys
        return params, opt_state, ys[0], ys[1]

    out_specs = (P(), P(), P()) if full_metrics else (P(), P(), P(), P())
    sharded = shard_map(
        device_multi, mesh=mesh,
        in_specs=(P(), P(), scan_specs, P(), P(), P(), P()),
        out_specs=out_specs,
        check=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def multi(params, opt_state, stacked, rng, lr_mean, lr_sigma, smask):
        return sharded(params, opt_state, stacked, rng, lr_mean, lr_sigma,
                       smask)

    return multi, init_opt


def make_aligned_forward(mesh, cfg: AlignnConfig, floor: float,
                         compute_dtype: str = "float32"):
    """Jitted multi-chip eval forward over a [D·E, ...]-stacked super-batch
    of graph-aligned sub-batches → ([D·E, G, T] mean, [D·E, G, T] logvar).
    Each device runs the standard (fused-kernel) forward on its slot;
    `compute_dtype='bfloat16'` applies the serving fast path's cast
    discipline per device (f32 outputs either way)."""
    from ..models.alignn import alignn_apply
    from ..train.loop import _cast_for_compute

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    specs = aligned_pspecs()
    both = P((DATA_AXIS, EDGE_AXIS))

    def device_fwd(params, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        params, batch = _cast_for_compute(params, batch, dtype)
        mean, logvar = alignn_apply(params, cfg, batch, train=False)
        return (mean.astype(jnp.float32)[None],
                jnp.maximum(logvar.astype(jnp.float32), floor)[None])

    sharded = shard_map(device_fwd, mesh=mesh,
                        in_specs=(P(), specs),
                        out_specs=(both, both),
                        check=False)
    return jax.jit(sharded)


import functools


@functools.lru_cache(maxsize=64)
def _cached_aligned_forward(cfg: AlignnConfig, floor: float, n_devices: int,
                            compute_dtype: str = "float32"):
    import jax as _jax

    mesh = None
    from .mesh import make_mesh

    mesh = make_mesh(n_devices, 1, devices=_jax.devices()[:n_devices])
    return make_aligned_forward(mesh, cfg, floor, compute_dtype), n_devices


def collect_predictions_auto(cfg: AlignnConfig, floor: float, params, batches,
                             compute_dtype: str = "float32"):
    """Multi-device drop-in for `train.loop.collect_predictions`.

    With one visible device (or a single batch) this is the single-device
    path — scan-amortized over the split's equal-shape batches
    (`collect_predictions_scanned`: one host dispatch per 16 batches)
    when the split is large enough to pay for it; with D devices, batches
    run D-at-a-time through the graph-aligned forward
    (`make_aligned_forward`) over a flat (D, 1) mesh — each device
    executes the standard fused/table forward on one complete sub-batch,
    so results are bit-comparable to the single-device loop.
    Returns (mean_z [N,T], sigma_z [N,T], y [N,T], sample_index [N]) over
    real graphs, in batch order.

    `compute_dtype='bfloat16'` runs the trunk in bf16 on both routes
    (serving fast path; the aligned forward casts per device).
    """
    import jax as _jax

    from ..train.loop import collect_predictions_scanned

    batches = list(batches)
    n_dev = len(_jax.devices())
    if n_dev <= 1 or len(batches) <= 1:
        return collect_predictions_scanned(cfg, floor, params, batches,
                                           compute_dtype=compute_dtype)
    fwd, n_dev = _cached_aligned_forward(cfg, floor, n_dev, compute_dtype)
    means, sigmas, ys, idxs = [], [], [], []
    for at in range(0, len(batches), n_dev):
        group = batches[at:at + n_dev]
        mean, logvar = fwd(params, stack_for_mesh(group, n_dev))
        mean = np.asarray(mean)
        sigma = np.sqrt(np.exp(np.asarray(logvar)))
        for d, b in enumerate(group):
            mask = np.asarray(b.graph_mask) > 0
            means.append(mean[d][mask])
            sigmas.append(sigma[d][mask])
            # match collect_predictions: invalid targets → NaN, not 1.0
            yv = np.where(np.asarray(b.y_mask) > 0, np.asarray(b.y), np.nan)
            ys.append(yv[mask])
            idxs.append(np.asarray(b.sample_index)[mask])
    return (np.concatenate(means), np.concatenate(sigmas),
            np.concatenate(ys), np.concatenate(idxs))


def make_sharded_forward(mesh, cfg: AlignnConfig, floor: float,
                         table_widths: tuple | None = None,
                         impl: str | None = None,
                         row_windows: tuple | None = None):
    """Jitted multi-chip eval forward over stacked batches → [D, G, T] each."""
    specs = batch_pspecs()

    def device_fwd(params, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        mean, logvar = sharded_apply(params, cfg, batch, axis_name=EDGE_AXIS,
                                     train=False, table_widths=table_widths,
                                     impl=impl, row_windows=row_windows)
        return mean[None], jnp.maximum(logvar, floor)[None]

    sharded = shard_map(device_fwd, mesh=mesh,
                        in_specs=(P(), specs),
                        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                        check=False)
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# boundary-exchange formulation (parallel.boundary_shard)
# ---------------------------------------------------------------------------

# graph-level fields replicated across the edge axis (per-rank fields carry
# the [S] shard axis and split over EDGE_AXIS)
_BD_REPLICATED = {"globals_", "sg_num", "y", "y_mask", "graph_mask", "weight"}


def boundary_pspecs():
    from .boundary_shard import BoundaryBatch

    return BoundaryBatch(**{
        f: (P(DATA_AXIS) if f in _BD_REPLICATED else P(DATA_AXIS, EDGE_AXIS))
        for f in BoundaryBatch._fields})


def stack_boundary_for_mesh(bbs, n_data: int):
    """Stack `n_data` same-plan BoundaryBatches on a leading data axis."""
    from .boundary_shard import BoundaryBatch

    if len(bbs) != n_data:
        raise ValueError(f"got {len(bbs)} boundary batches for {n_data} "
                         "data ranks")
    return BoundaryBatch(*[np.stack([np.asarray(getattr(b, f)) for b in bbs])
                           for f in BoundaryBatch._fields])


def _strip_boundary(bb):
    from .boundary_shard import BoundaryBatch

    return BoundaryBatch(**{
        f: (getattr(bb, f)[0] if f in _BD_REPLICATED else getattr(bb, f)[0, 0])
        for f in BoundaryBatch._fields})


def boundary_table_pspecs():
    from .boundary_shard import BoundaryTables

    return BoundaryTables(**{f: P(DATA_AXIS, EDGE_AXIS)
                             for f in BoundaryTables._fields})


def stack_boundary_tables(tables_list):
    from .boundary_shard import BoundaryTables

    return BoundaryTables(*[
        np.stack([np.asarray(getattr(t, f)) for t in tables_list])
        for f in BoundaryTables._fields])


def _strip_tables(tb):
    from .boundary_shard import BoundaryTables

    return BoundaryTables(**{f: getattr(tb, f)[0, 0]
                             for f in BoundaryTables._fields})


def make_boundary_train_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                             log_means: np.ndarray, log_stds: np.ndarray,
                             plan, meta=None, _body_out=None,
                             full_metrics: bool = False):
    """Train step on the boundary-exchange edge partition → (step, init_opt).

    Mirrors `make_sharded_train_step`'s gradient accounting: the loss is
    replicated across the edge axis (pooled features are psum'd), so edge-axis
    grads combine with pmean (the psum transpose re-psums cotangents — see the
    note in `make_sharded_train_step`), then sum over the data axis and
    normalize by the global real-graph count. The only per-conv communication
    inside the forward is the boundary `all_to_all` (volume ∝
    `plan.comm_bytes_per_conv`).

    With `meta` (a BoundaryKernelMeta from `build_boundary_tables`), the step
    takes an extra stacked-BoundaryTables operand after the batch and runs
    each rank's convs on the dense-table / fused-kernel path:
        step(params, opt, bb, tables, rng, lr_mean, lr_sigma, smask)

    `full_metrics=True` returns `(params, opt_state, StepMetrics)` with
    data-axis-summed sums (metric inputs are edge-replicated), so the
    production trainer consumes this step interchangeably with the others.
    """
    from ..train.loop import StepMetrics, _cast_for_compute
    from .boundary_shard import boundary_apply

    adam = optax.scale_by_adam()
    mu = jnp.asarray(log_means, dtype=jnp.float32)
    sd = jnp.asarray(log_stds, dtype=jnp.float32)
    specs = boundary_pspecs()
    dtype = jnp.bfloat16 if hyper.compute_dtype == "bfloat16" else jnp.float32

    def local_loss(params, bb, tables, rng):
        if hyper.feature_jitter_std > 0.0 and rng is not None:
            rank = jax.lax.axis_index(EDGE_AXIS)
            kx = jax.random.fold_in(jax.random.fold_in(rng, 7), rank)
            kg, _ = jax.random.split(jax.random.fold_in(rng, 11))
            bb = bb._replace(
                nodes=bb.nodes + hyper.feature_jitter_std
                * jax.random.normal(kx, bb.nodes.shape),
                # globals are replicated: jitter with the SHARED key so the
                # replicated tail stays replicated across edge ranks
                globals_=bb.globals_ + hyper.feature_jitter_std
                * jax.random.normal(kg, bb.globals_.shape))
        c_params, c_bb = _cast_for_compute(params, bb, dtype)
        mean, logvar = boundary_apply(c_params, cfg, c_bb, plan,
                                      axis_name=EDGE_AXIS, train=True,
                                      rng=rng, tables=tables, meta=meta)
        loss_sum, sample_sum, n_real = nll_loss_sums(mean, logvar, bb,
                                                     mu, sd, hyper)
        if not full_metrics:
            return loss_sum, (sample_sum, n_real)
        # RAW logvar, matching the single-device step body's diagnostics
        # (train/loop._make_step_body) — mesh and single-device members must
        # report comparable train_logvar/max_var even when the floor binds
        lv = logvar.astype(jnp.float32)
        pred = jnp.exp(mean.astype(jnp.float32) * sd + mu)
        el_mask = bb.graph_mask[:, None] * bb.y_mask
        err = (pred - bb.y) * el_mask
        local_m = StepMetrics(
            loss_sum=sample_sum, n_graphs=n_real,
            abs_err_sum=jnp.abs(err).sum(), sq_err_sum=(err ** 2).sum(),
            n_elements=el_mask.sum(), logvar_sum=(lv * el_mask).sum(),
            max_var=jnp.max(jnp.exp(lv) * bb.graph_mask[:, None]))
        return loss_sum, (sample_sum, n_real, local_m)

    def body(params, opt_state, bb, tables, key, lr_mean, lr_sigma, smask):
        """One optimizer step on already-local (stripped) operands — shared
        by the single-step wrapper and the scan-over-steps program."""
        (_, aux), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, bb, tables, key)
        if full_metrics:
            loss_sum, n_local, local_m = aux
        else:
            loss_sum, n_local = aux
        grads = jax.lax.pmean(grads, EDGE_AXIS)
        grads = jax.lax.psum(grads, DATA_AXIS)
        n_global = jnp.maximum(jax.lax.psum(n_local, DATA_AXIS), 1.0)
        grads = jax.tree.map(lambda g: g / n_global, grads)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = adam.update(grads, opt_state, params)
        wd = hyper.weight_decay

        def apply_leaf(u, p, is_sigma):
            lr = jnp.where(is_sigma, lr_sigma, lr_mean)
            return p - lr * (u + wd * p)

        params = jax.tree.map(apply_leaf, updates, params,
                              jax.tree.map(jnp.asarray, smask))
        if full_metrics:
            # metric inputs are replicated across the edge axis (pooled
            # outputs are psum'd inside the forward) — sum over DATA only
            metrics = jax.lax.psum(
                local_m._replace(max_var=jnp.zeros(())), DATA_AXIS)
            metrics = metrics._replace(
                max_var=jax.lax.pmax(local_m.max_var, DATA_AXIS))
            return params, opt_state, metrics
        loss_total = jax.lax.psum(loss_sum, DATA_AXIS)
        return params, opt_state, loss_total / n_global, n_global

    def device_step(params, opt_state, bb, tables, rng, lr_mean, lr_sigma,
                    smask):
        bb = _strip_boundary(bb)
        if tables is not None:
            tables = _strip_tables(tables)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return body(params, opt_state, bb, tables, rng, lr_mean, lr_sigma,
                    smask)

    if _body_out is not None:
        _body_out.append(body)

    out_specs = (P(), P(), P()) if full_metrics else (P(), P(), P(), P())
    if meta is None:
        sharded = shard_map(
            lambda p, o, bb, r, lm, ls, sm: device_step(p, o, bb, None, r,
                                                        lm, ls, sm),
            mesh=mesh,
            in_specs=(P(), P(), specs, P(), P(), P(), P()),
            out_specs=out_specs,
            check=False)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, bb, rng, lr_mean, lr_sigma, smask):
            return sharded(params, opt_state, bb, rng, lr_mean, lr_sigma,
                           smask)
    else:
        sharded = shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), P(), specs, boundary_table_pspecs(), P(), P(),
                      P(), P()),
            out_specs=out_specs,
            check=False)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, bb, tables, rng, lr_mean, lr_sigma,
                 smask):
            return sharded(params, opt_state, bb, tables, rng, lr_mean,
                           lr_sigma, smask)

    return step, (lambda params: adam.init(params))


def make_boundary_scan_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                            log_means: np.ndarray, log_stds: np.ndarray,
                            plan, meta=None):
    """Scan-over-steps variant of the boundary step: ONE jitted program runs
    K optimizer steps over a [K, D, S, ...]-stacked BoundaryBatch pytree
    (lax.scan inside shard_map) — the host leaves the inner loop, exactly as
    `make_aligned_scan_step`. The dense tables are LOOP-INVARIANT (one plan
    covers every step), so they are passed once, not K-stacked:

        multi(params, opt, stacked_bb, tables?, rng, lr_mean, lr_sigma, smask)
        → (params, opt, losses [K], ns [K])
    """
    body_out: list = []
    _, init_opt = make_boundary_train_step(mesh, cfg, hyper, log_means,
                                           log_stds, plan, meta=meta,
                                           _body_out=body_out)
    body = body_out[0]
    from .boundary_shard import BoundaryBatch

    specs = boundary_pspecs()
    scan_specs = jax.tree.map(lambda s: P(None, *s), specs)

    def strip_scan(bb):
        return BoundaryBatch(**{
            f: (getattr(bb, f)[:, 0] if f in _BD_REPLICATED
                else getattr(bb, f)[:, 0, 0])
            for f in BoundaryBatch._fields})

    def device_multi(params, opt_state, stacked, tables, rng, lr_mean,
                     lr_sigma, smask):
        local = strip_scan(stacked)                       # [K, ...] per rank
        if tables is not None:
            tables = _strip_tables(tables)
        n_steps = jax.tree.leaves(local)[0].shape[0]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        keys = jax.random.split(rng, n_steps)

        def f(carry, xs):
            p, o = carry
            b, k = xs
            p, o, loss, n = body(p, o, b, tables, k, lr_mean, lr_sigma,
                                 smask)
            return (p, o), (loss, n)

        (params, opt_state), (losses, ns) = jax.lax.scan(
            f, (params, opt_state), (local, keys))
        return params, opt_state, losses, ns

    if meta is None:
        sharded = shard_map(
            lambda p, o, bb, r, lm, ls, sm: device_multi(p, o, bb, None, r,
                                                         lm, ls, sm),
            mesh=mesh,
            in_specs=(P(), P(), scan_specs, P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check=False)

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi(params, opt_state, bb, rng, lr_mean, lr_sigma, smask):
            return sharded(params, opt_state, bb, rng, lr_mean, lr_sigma,
                           smask)
    else:
        sharded = shard_map(
            device_multi, mesh=mesh,
            in_specs=(P(), P(), scan_specs, boundary_table_pspecs(), P(),
                      P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check=False)

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi(params, opt_state, bb, tables, rng, lr_mean, lr_sigma,
                  smask):
            return sharded(params, opt_state, bb, tables, rng, lr_mean,
                           lr_sigma, smask)

    return multi, init_opt


@functools.lru_cache(maxsize=64)
def cached_boundary_forward(mesh, cfg: AlignnConfig, floor: float, plan,
                            compute_dtype: str = "float32"):
    """Memoized `make_boundary_forward` (COO path): ensemble loops build one
    jitted program per distinct (mesh, config, plan), not per member — a
    fresh jit wrapper per member recompiles the identical program (~minutes
    each through a remote compile service; see PERF.md round 2)."""
    return make_boundary_forward(mesh, cfg, floor, plan,
                                 compute_dtype=compute_dtype)


def make_boundary_forward(mesh, cfg: AlignnConfig, floor: float, plan,
                          meta=None, compute_dtype: str = "float32"):
    """Jitted eval forward on the boundary partition → [D, G, T] each.
    With `meta`, takes a stacked-BoundaryTables operand after the batch.
    `compute_dtype='bfloat16'` applies the serving fast path's cast to the
    local arenas (BoundaryBatch shares the feature field names the cast
    keys on; f32 outputs either way)."""
    from ..train.loop import _cast_for_compute
    from .boundary_shard import boundary_apply

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    specs = boundary_pspecs()

    def device_fwd(params, bb, tables):
        bb = _strip_boundary(bb)
        if tables is not None:
            tables = _strip_tables(tables)
        params, bb = _cast_for_compute(params, bb, dtype)
        mean, logvar = boundary_apply(params, cfg, bb, plan,
                                      axis_name=EDGE_AXIS, train=False,
                                      tables=tables, meta=meta)
        return (mean.astype(jnp.float32)[None],
                jnp.maximum(logvar.astype(jnp.float32), floor)[None])

    if meta is None:
        sharded = shard_map(lambda p, bb: device_fwd(p, bb, None), mesh=mesh,
                            in_specs=(P(), specs),
                            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                            check=False)
    else:
        sharded = shard_map(device_fwd, mesh=mesh,
                            in_specs=(P(), specs, boundary_table_pspecs()),
                            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                            check=False)
    return jax.jit(sharded)


def make_boundary_grads(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                        log_means: np.ndarray, log_stds: np.ndarray, plan,
                        meta=None):
    """(params, bb[, tables], rng) → (loss, grads): the boundary step's exact
    gradient pipeline without the optimizer — the parity surface for tests."""
    from .boundary_shard import boundary_apply

    mu = jnp.asarray(log_means, dtype=jnp.float32)
    sd = jnp.asarray(log_stds, dtype=jnp.float32)
    specs = boundary_pspecs()

    def local_loss(params, bb, tables, rng):
        mean, logvar = boundary_apply(params, cfg, bb, plan,
                                      axis_name=EDGE_AXIS, train=False,
                                      rng=rng, tables=tables, meta=meta)
        loss_sum, _, n_real = nll_loss_sums(mean, logvar, bb, mu, sd, hyper)
        return loss_sum, n_real

    def device_grads(params, bb, tables, rng):
        bb = _strip_boundary(bb)
        if tables is not None:
            tables = _strip_tables(tables)
        (loss_sum, n_local), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, bb, tables, rng)
        grads = jax.lax.pmean(grads, EDGE_AXIS)
        grads = jax.lax.psum(grads, DATA_AXIS)
        n_global = jnp.maximum(jax.lax.psum(n_local, DATA_AXIS), 1.0)
        grads = jax.tree.map(lambda g: g / n_global, grads)
        loss = jax.lax.psum(loss_sum, DATA_AXIS) / n_global
        return loss, grads

    if meta is None:
        sharded = shard_map(
            lambda p, bb, r: device_grads(p, bb, None, r), mesh=mesh,
            in_specs=(P(), specs, P()), out_specs=(P(), P()), check=False)
    else:
        sharded = shard_map(
            device_grads, mesh=mesh,
            in_specs=(P(), specs, boundary_table_pspecs(), P()),
            out_specs=(P(), P()), check=False)
    return jax.jit(sharded)
