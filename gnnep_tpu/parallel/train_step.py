"""Multi-chip training step: data parallelism × edge partitioning via shard_map.

One jitted step over a `Mesh(("data", "edge"))`:
- each data-rank consumes its own padded `GraphBatch`; edge/LG arenas are
  additionally split across the edge axis (see `edge_shard.py`)
- the loss is computed in sum form per device; gradients are `psum` across
  the edge axis (partial-edge contributions) and across the data axis, then
  normalized by the global real-graph count — exactly the single-device
  mean-loss gradient
- the AdamW update runs replicated (identical on every device), so params
  and optimizer state never need resharding

Batch staging: `stack_for_mesh` stacks D per-rank batches into leading-axis-D
arrays; shard_map's in_specs place graph/node arenas on the data axis only
and edge/LG arenas on (data, edge).
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..data.batching import GraphBatch
from ..models.alignn import AlignnConfig
from ..train.loop import TrainHyper
from .edge_shard import sharded_apply
from .mesh import DATA_AXIS, EDGE_AXIS

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


def make_sharded_train_step(mesh, cfg: AlignnConfig, hyper: TrainHyper,
                            log_means: np.ndarray, log_stds: np.ndarray):
    """Build the jitted multi-chip train step + optimizer init."""
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
                                     train=True, rng=rng)
        logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
        y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd
        diff = mean - y_z
        nll = 0.5 * (logvar + diff ** 2 / jnp.exp(logvar)) * batch.weight[:, None]
        sample_loss = nll.mean(axis=1) * batch.graph_mask
        loss_sum = sample_loss.sum()
        if hyper.log_sigma_l2 > 0.0:
            ls2 = ((0.5 * logvar) ** 2 * batch.graph_mask[:, None]).sum() / y_z.shape[1]
            loss_sum = loss_sum + hyper.log_sigma_l2 * ls2
        return loss_sum, (sample_loss.sum(), batch.graph_mask.sum())

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
        check_rep=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, lr_mean, lr_sigma, smask):
        return sharded(params, opt_state, batch, rng, lr_mean, lr_sigma, smask)

    return step, (lambda params: adam.init(params))


def make_sharded_forward(mesh, cfg: AlignnConfig, floor: float):
    """Jitted multi-chip eval forward over stacked batches → [D, G, T] each."""
    specs = batch_pspecs()

    def device_fwd(params, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        mean, logvar = sharded_apply(params, cfg, batch, axis_name=EDGE_AXIS,
                                     train=False)
        return mean[None], jnp.maximum(logvar, floor)[None]

    sharded = shard_map(device_fwd, mesh=mesh,
                        in_specs=(P(), specs),
                        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                        check_rep=False)
    return jax.jit(sharded)
