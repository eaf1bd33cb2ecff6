"""Edge-partitioned ALIGNN forward pass (runs inside `shard_map`).

The scale-out design the reference has no analogue for (SURVEY.md §2g):
graphs are small but message passing is edge-dominated, so within one batch
the bond arena and the line-graph (angle) arena are sharded across the mesh's
"edge" axis. Node/bond *states* stay replicated; each device computes the
attention contributions of its local edge slice and partial segment
aggregates are combined with XLA collectives over ICI:

    m      = pmax (local segment-max of logits)        # softmax stabilizer
    denom  = psum (local Σ exp)                        # softmax normalizer
    msgsum = psum (local Σ α·v)                        # weighted aggregate

One pmax + one psum pair per convolution — the all-reduce formulation of
edge partitioning (no halo indices to exchange, since states are
replicated; the communicated tensors are [N, heads] and [N, H]).

All functions assume they execute inside `shard_map` with `axis_name`
bound; arrays carrying the edge/LG arenas arrive pre-sharded on their
leading axis.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.featurize import N_SG
from ..models.alignn import Params, _dropout, _layer_norm, _mlp
from ..ops.graph_attention import TransformerConvParams
from ..ops.segment import gather_rows, segment_mean, segment_sum

_NEG = -1e30


def edge_sharded_conv(
    params: TransformerConvParams,
    x: jnp.ndarray,              # [N, H] replicated states (gather source)
    src: jnp.ndarray,            # [E_loc] local slice of message sources
    dst: jnp.ndarray,            # [E_loc] local slice of targets
    edge_attr: jnp.ndarray,      # [E_loc, F_e] local per-edge features
    *,
    heads: int,
    axis_name: str,
    edge_mask: Optional[jnp.ndarray] = None,   # [E_loc]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    comm_chunks: int = 1,
    row_post=None,
) -> jnp.ndarray:
    """β-gated transformer conv with the edge dimension sharded over
    `axis_name`. Numerically equal to `ops.graph_attention.transformer_conv`
    on the unsharded arrays (up to float reduction order).

    `comm_chunks` > 1 splits the partial-aggregate all-reduce into that
    many row chunks; everything downstream of the combine (softmax
    normalization, the β gate, and the caller's `row_post`) is row-local,
    so XLA can launch chunk c+1's psum while chunk c's postprocessing
    computes — the comm/compute overlap SURVEY §7 step 7 prescribes for
    the boundary exchange, realized as a pipelined all-reduce. Outputs are
    bit-identical for every chunk count (psum of a row slice == row slice
    of the psum). `row_post(rows, r0, r1)` maps each combined chunk
    (e.g. LayerNorm + residual) before reassembly.
    """
    n = x.shape[0]
    hidden = params.w_query.shape[1]
    ch = hidden // heads

    q = (x @ params.w_query + params.b_query).reshape(n, heads, ch)
    k = (x @ params.w_key + params.b_key).reshape(n, heads, ch)
    v = (x @ params.w_value + params.b_value).reshape(n, heads, ch)
    e = (edge_attr @ params.w_edge).reshape(-1, heads, ch)

    k_j = gather_rows(k, src) + e
    v_j = gather_rows(v, src) + e
    logits = jnp.sum(gather_rows(q, dst) * k_j, axis=-1) / math.sqrt(ch)  # [E_loc, heads]
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None] > 0, logits, _NEG)

    # max-stabilizer is gradient-free (softmax is shift-invariant)
    local_max = jax.ops.segment_max(jax.lax.stop_gradient(logits), dst, n)
    seg_max = jnp.maximum(jax.lax.pmax(local_max, axis_name), _NEG)
    seg_max = jax.lax.stop_gradient(seg_max)
    expd = jnp.exp(logits - gather_rows(seg_max, dst))
    if edge_mask is not None:
        expd = expd * edge_mask[:, None]
    local_denom = segment_sum(expd, dst, n)

    if dropout_rate > 0.0 and dropout_rng is not None:
        # dropout on α must follow normalization, so the [N, heads] denom
        # combine has to complete before α exists; only the α·v aggregate
        # rides the chunked pipeline (and un-dropped msg partials are never
        # communicated — the fused-psum formulation sent [N, H] of them
        # just to discard them here)
        denom = jnp.maximum(jax.lax.psum(local_denom, axis_name), 1e-16)
        alpha = expd / gather_rows(denom, dst)
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis_name)),
            1.0 - dropout_rate, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)
        local_agg = segment_sum(alpha[..., None] * v_j, dst, n
                                ).reshape(n, hidden)

        def combine(r0, r1):
            return jax.lax.psum(local_agg[r0:r1], axis_name)
    else:
        local_msg = segment_sum(expd[..., None] * v_j, dst, n)  # [N, heads, ch]
        # fuse both partial aggregates into one (chunked) psum
        stacked_local = jnp.concatenate([local_msg.reshape(n, hidden),
                                         local_denom], axis=-1)

        def combine(r0, r1):
            st = jax.lax.psum(stacked_local[r0:r1], axis_name)
            dn = jnp.maximum(st[:, hidden:], 1e-16)
            return (st[:, :hidden].reshape(-1, heads, ch)
                    / dn[..., None]).reshape(-1, hidden)

    r_full = x @ params.w_skip + params.b_skip
    n_chunks = max(int(comm_chunks), 1)
    bounds = [i * n // n_chunks for i in range(n_chunks + 1)]
    outs = []
    for c in range(n_chunks):
        r0, r1 = bounds[c], bounds[c + 1]
        if r0 == r1:
            continue
        msg = combine(r0, r1)
        rr = r_full[r0:r1]
        beta = jax.nn.sigmoid(jnp.concatenate([rr, msg, rr - msg], axis=-1)
                              @ params.w_beta)
        out = beta * rr + (1.0 - beta) * msg
        outs.append(row_post(out, r0, r1) if row_post is not None else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def sharded_trunk(params: Params, cfg, batch, *, axis_name: str,
                  train: bool = False, rng: Optional[jax.Array] = None,
                  comm_chunks: int = 1) -> jnp.ndarray:
    """Edge-sharded equivalent of `models.alignn._shared_trunk`.

    `batch` carries node/graph arenas replicated and edge/LG arenas sharded
    on their leading axis. Bond *states* are materialized replicated via an
    all-gather of the locally-encoded slice. `comm_chunks` > 1 pipelines
    each conv's all-reduce against its row-local epilogue (LayerNorm,
    residual, dropout) — see `edge_sharded_conv`; results are
    chunk-count-invariant (residual dropout masks are drawn full-size and
    sliced per chunk).
    """
    drop = cfg.dropout if train else 0.0

    def next_key():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    node_state = _mlp(params["node_enc"], batch.nodes)
    # encode local bond slice, then all-gather to the full replicated arena
    edge_state_local = _mlp(params["edge_enc"], batch.edge_attr)
    edge_state = jax.lax.all_gather(edge_state_local, axis_name,
                                    axis=0, tiled=True)          # [Ep, H]
    angle_emb = _mlp(params["angle_enc"], batch.lg_attr)          # local slice

    n_shards = jax.lax.psum(1, axis_name)
    e_local = batch.edge_src.shape[0]
    my_shard = jax.lax.axis_index(axis_name)

    has_lg = jax.lax.psum(jnp.sum(batch.lg_mask), axis_name) > 0
    has_edges = jax.lax.psum(jnp.sum(batch.edge_mask), axis_name) > 0

    def make_post(block, state, gate, key):
        """Row-local conv epilogue: LN → residual add with dropout(relu),
        gated by `gate` (all-padding batches leave the state unchanged).
        The dropout mask is drawn over the FULL state so outputs do not
        depend on comm_chunks."""
        keep = None
        if drop > 0.0 and key is not None:
            keep = jax.random.bernoulli(key, 1.0 - drop, state.shape)

        def post(rows, r0, r1):
            o = _layer_norm(rows, block["ln_scale"], block["ln_bias"])
            a = jax.nn.relu(o)
            if keep is not None:
                a = jnp.where(keep[r0:r1], a / (1.0 - drop), 0.0)
            return jnp.where(gate, state[r0:r1] + a, state[r0:r1])

        return post

    for eb, nb in zip(params["edge_blocks"], params["node_blocks"]):
        edge_state = edge_sharded_conv(
            eb["conv"], edge_state, batch.lg_src, batch.lg_dst, angle_emb,
            heads=cfg.heads, axis_name=axis_name, edge_mask=batch.lg_mask,
            dropout_rate=drop, dropout_rng=next_key(),
            comm_chunks=comm_chunks,
            row_post=make_post(eb, edge_state, has_lg, next_key()))

        # atom conv consumes the local slice of projected bond states
        local_rows = jax.lax.dynamic_slice_in_dim(
            edge_state, my_shard * e_local, e_local, axis=0)
        edge_feat = local_rows @ nb["edge_proj_w"] + nb["edge_proj_b"]
        node_state = edge_sharded_conv(
            nb["conv"], node_state, batch.edge_src, batch.edge_dst, edge_feat,
            heads=cfg.heads, axis_name=axis_name, edge_mask=batch.edge_mask,
            dropout_rate=drop, dropout_rng=next_key(),
            comm_chunks=comm_chunks,
            row_post=make_post(nb, node_state, has_edges, next_key()))

    n_graphs = batch.y.shape[0]
    pooled = segment_mean(node_state, batch.node_graph, n_graphs + 1)[:n_graphs]
    sg_one_hot = jax.nn.one_hot(batch.sg_num - 1, N_SG, dtype=pooled.dtype)
    feats = jnp.concatenate([pooled, batch.globals_, sg_one_hot], axis=-1)
    feats = _dropout(feats, drop, next_key())
    shared = jax.nn.relu(feats @ params["feat_proj"]["w"] + params["feat_proj"]["b"])
    return _dropout(shared, drop, next_key())


def sharded_apply(params: Params, cfg, batch, *, axis_name: str,
                  train: bool = False, rng: Optional[jax.Array] = None,
                  comm_chunks: int = 1):
    shared = sharded_trunk(params, cfg, batch, axis_name=axis_name,
                           train=train, rng=rng, comm_chunks=comm_chunks)
    mean = shared @ params["mean_head"]["w"] + params["mean_head"]["b"]
    logvar = shared @ params["logvar_head"]["w"] + params["logvar_head"]["b"]
    return mean, logvar
