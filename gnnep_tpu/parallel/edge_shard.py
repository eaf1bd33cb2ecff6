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
from ..ops.graph_attention import TransformerConvParams, beta_blend
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
    row_ptr: Optional[jnp.ndarray] = None,  # [N+1] GLOBAL CSR ptrs of dst
    table_width: int = 0,        # static per-row span cap (impl='table')
    impl: str = "coo",
    win64: int = 0,              # per-64-row group span bound (windowed impl)
    row_window: int = 0,         # static per-rank target-row window (scaling)
) -> jnp.ndarray:
    """β-gated transformer conv with the edge dimension sharded over
    `axis_name`. Numerically equal to `ops.graph_attention.transformer_conv`
    on the unsharded arrays (up to float reduction order).

    `impl='table'` (requires `row_ptr` + `table_width`): the local partial
    reductions run on an IMPLICIT dense incoming table instead of XLA
    segment ops. Because each rank's slice is CSR-contiguous, its local
    table needs no pack-time construction: local row pointers are
    `clip(global_row_ptr − E0, 0, E_loc)` and every row's slots are
    consecutive, so the table is a broadcasted iota and the inverse map a
    gather — scatter-free in BOTH passes (the COO formulation's
    segment-sum transposes are row-serial scatter-adds on TPU, the dominant
    backward cost; see PERF.md). `table_width` must dominate every row's
    LOCAL slot span — the in-degree caps cover undiluted batches; a batch
    diluted for win64 bounds interleaves padding rows into real spans, so
    pass a measured span (`train_step.measure_table_widths`) or fall back
    to 'coo'.

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

    if impl == "windowed" and row_ptr is not None and table_width > 0:
        from ..ops.pallas.csr_attention import fusable as _w_ok
        # widest windowed stream on the ACTUAL execution path: the
        # no-dropout aggregate concats [v_j*expd_h (H) ‖ expd_pad (128)]
        # → H + 128; with dropout the aggregates run separately, so the
        # widest stream is max(H, 128). A TRACED dropout_rate (per-member
        # vmapped rates) can't be compared in Python — use the conservative
        # H + 128 bound, which dominates both paths.
        wide = (max(hidden, 128)
                if isinstance(dropout_rate, (int, float))
                and dropout_rate > 0.0 and dropout_rng is not None
                else hidden + 128)
        if _w_ok(n, src.shape[0], table_width, hidden=wide):
            return _windowed_conv(
                params, x, src, dst, edge_attr, heads=heads,
                axis_name=axis_name, edge_mask=edge_mask,
                dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                comm_chunks=comm_chunks, row_post=row_post, row_ptr=row_ptr,
                table_width=table_width, win64=win64, row_window=row_window)
        impl = "coo"  # windowed preconditions unmet; COO beats the dense
        # table at scale (PERF.md round-3 table: 0.65M vs 0.47M edges/s)

    q = (x @ params.w_query + params.b_query).reshape(n, heads, ch)
    k = (x @ params.w_key + params.b_key).reshape(n, heads, ch)
    v = (x @ params.w_value + params.b_value).reshape(n, heads, ch)
    e = (edge_attr @ params.w_edge).reshape(-1, heads, ch)

    k_j = gather_rows(k, src) + e
    v_j = gather_rows(v, src) + e
    logits = jnp.sum(gather_rows(q, dst) * k_j, axis=-1) / math.sqrt(ch)  # [E_loc, heads]
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None] > 0, logits, _NEG)

    use_table = impl == "table" and row_ptr is not None and table_width > 0
    if use_table:
        from ..ops.dense_attention import table_gather

        e_loc = src.shape[0]
        e0 = jax.lax.axis_index(axis_name) * e_loc
        lrp = jnp.clip(row_ptr.astype(jnp.int32) - e0, 0, e_loc)   # [N+1]
        starts = lrp[:-1]
        counts = jnp.minimum(lrp[1:] - starts, table_width)
        d_iota = jnp.arange(table_width, dtype=jnp.int32)
        tab = jnp.minimum(starts[:, None] + d_iota[None, :], e_loc - 1)
        tmask = d_iota[None, :] < counts[:, None]                  # [N, D]
        offs = jnp.arange(e_loc, dtype=jnp.int32) - starts[dst]
        pos = jnp.clip(dst.astype(jnp.int32) * table_width + offs,
                       0, n * table_width - 1)
        mask_t = tmask[..., None]
        if edge_mask is not None:
            mask_t = mask_t & (edge_mask[tab][..., None] > 0)
        logits_t = jnp.where(mask_t, table_gather(logits, tab, pos), _NEG)
        local_max = jnp.max(jax.lax.stop_gradient(logits_t), axis=1)
    else:
        # max-stabilizer is gradient-free (softmax is shift-invariant)
        local_max = jax.ops.segment_max(jax.lax.stop_gradient(logits), dst, n)
    seg_max = jnp.maximum(jax.lax.pmax(local_max, axis_name), _NEG)
    seg_max = jax.lax.stop_gradient(seg_max)

    if use_table:
        expd_t = jnp.exp(logits_t - seg_max[:, None, :]) \
            * mask_t.astype(logits_t.dtype)                        # [N, D, h]
        local_denom = expd_t.sum(axis=1)                           # [N, h]
        v_t = table_gather(v_j.reshape(e_loc, hidden), tab, pos
                           ).reshape(n, table_width, heads, ch)
    else:
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
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis_name)),
            1.0 - dropout_rate, logits.shape)
        if use_table:
            alpha_t = expd_t / denom[:, None, :]
            keep_t = keep[tab] & tmask[..., None]      # [N, D, heads]
            alpha_t = jnp.where(keep_t, alpha_t / (1.0 - dropout_rate), 0.0)
            local_agg = jnp.einsum("ndh,ndhc->nhc", alpha_t, v_t
                                   ).reshape(n, hidden)
        else:
            alpha = expd / gather_rows(denom, dst)
            alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)
            local_agg = segment_sum(alpha[..., None] * v_j, dst, n
                                    ).reshape(n, hidden)

        def combine(r0, r1):
            return jax.lax.psum(local_agg[r0:r1], axis_name)
    else:
        if use_table:
            local_msg = jnp.einsum("ndh,ndhc->nhc", expd_t, v_t)
        else:
            local_msg = segment_sum(expd[..., None] * v_j, dst, n)
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
        out = beta_blend(params.w_beta, rr, msg)
        outs.append(row_post(out, r0, r1) if row_post is not None else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _windowed_conv(params: TransformerConvParams, x, src, dst, edge_attr, *,
                   heads: int, axis_name: str, edge_mask, dropout_rate,
                   dropout_rng, comm_chunks: int, row_post, row_ptr,
                   table_width: int, win64: int = 0, row_window: int = 0):
    """Windowed-kernel formulation of the edge-sharded conv — the fast path.

    Every wide tensor stays 2-D [·, H] (the [N, D, heads(,ch)] dense-table
    layouts tile-pad 4-32× on TPU — measured 0.72× vs COO at flagship
    scale; see PERF.md layout rules). Per-head reductions/expansions are
    0/1 blocksum GEMMs, the q gather rides `csr_gather` (windowed
    segment-sum VJP), and BOTH partial aggregates (Σ exp·v ‖ Σ exp,
    channel-duplicated so the combine is pure elementwise) come from ONE
    `csr_segment_sum` call — MXU forward, gather backward, no XLA scatter
    in either pass. `table_width` must dominate every real row's local
    span (`measure_table_widths`); the dummy tail row may be under-covered,
    which is sound because its output row never reaches the loss (zero
    cotangent).

    `row_window` (static, multiple of 128; `measure_row_windows`) bounds
    the AGGREGATION-TARGET rows any rank's slice touches: because slices
    are CSR-contiguous, each rank's rows form one contiguous range, so the
    q projection, the q gather, and every windowed reduction run on a
    dynamic [R]-row slice instead of all N rows — per-rank reduction
    compute scales as N/S with the shard count. (The psum'd combine stays
    [N]-shaped: that is the all-reduce formulation's communication floor;
    k/v/skip projections stay replicated because message SOURCES are the
    graph's topology, not a contiguous range.) 0 disables (R = N)."""
    import numpy as _np

    n = x.shape[0]
    hidden = params.w_query.shape[1]
    ch = hidden // heads
    e_loc = src.shape[0]
    _interp = jax.default_backend() != "tpu"
    from ..ops.pallas.csr_attention import csr_gather, csr_segment_sum

    e0 = jax.lax.axis_index(axis_name) * e_loc
    lrp = jnp.clip(row_ptr.astype(jnp.int32) - e0, 0, e_loc)      # [N+1]

    R = int(row_window) if 0 < int(row_window) < n else n
    if R < n and (n % 128 != 0 or R % 128 != 0):
        # the clip below can only preserve the 128-aligned window start
        # (which the win64 group bounds and DMA slices rely on) when both
        # the arena and the window are 128-multiples; standard budgets pad
        # row arenas to 128 (`data.batching`), but hand-built arenas may
        # not — disable row windowing rather than risk a misaligned window
        R = n
    if R < n:
        # first row whose segment intersects the local slice, 128-aligned
        # down (the measured R includes this alignment slack)
        r_lo = jnp.searchsorted(row_ptr.astype(jnp.int32), e0,
                                side="right") - 1
        r_lo = jnp.clip((r_lo // 128) * 128, 0, n - R).astype(jnp.int32)
        # contract guard: `row_window` must come from measure_row_windows
        # (cover every rank's row span). Under-coverage would clip
        # out-of-window edges onto row R-1 and DROP their true rows'
        # contributions — silently wrong. Poison every partial with NaN
        # instead, so a violated contract fails loudly and deterministically
        hi_row = jnp.searchsorted(row_ptr.astype(jnp.int32),
                                  e0 + e_loc - 1, side="right") - 1
        poison = jnp.where(hi_row - r_lo >= R, jnp.float32(jnp.nan),
                           jnp.float32(1.0))
    else:
        r_lo = jnp.int32(0)
        poison = jnp.float32(1.0)
    lrp_w = jax.lax.dynamic_slice(lrp, (r_lo,), (R + 1,))
    starts_w = lrp_w[:-1]
    dst_w = jnp.clip(dst - r_lo, 0, R - 1).astype(dst.dtype)

    def expand(rows):
        """[R, ·] rank-local partial → [N, ·] (zeros elsewhere) for the
        cross-rank combine, NaN-poisoned on a row-window contract breach
        (all N rows: a dropped contribution lands OUTSIDE the window, so
        only a whole-array poison is reliably loud)."""
        if R == n:
            return rows
        out = jax.lax.dynamic_update_slice(
            jnp.zeros((n, rows.shape[1]), rows.dtype), rows,
            (r_lo, jnp.int32(0)))
        return out + (poison - 1.0).astype(out.dtype)

    # global per-64-row group span bounds remain valid for every shard's
    # local slice (clipping row pointers only shrinks spans, and r_lo is
    # 128-aligned so 64-row groups are preserved) — they cut the windowed
    # kernels' VMEM windows ~2-7× below block·max_row_span
    x_w = (x if R == n
           else jax.lax.dynamic_slice(x, (r_lo, jnp.int32(0)),
                                      (R, x.shape[1])))
    q2 = x_w @ params.w_query + params.b_query                    # [R, H]
    k2 = x @ params.w_key + params.b_key
    v2 = x @ params.w_value + params.b_value
    e2 = edge_attr @ params.w_edge                                # [E, H]
    k_j = gather_rows(k2, src) + e2
    v_j = gather_rows(v2, src) + e2
    q_dst = csr_gather(q2, dst_w, starts_w, table_width, _interp, win64)

    bh = jnp.asarray(_np.repeat(_np.eye(heads, dtype=_np.float32), ch,
                                axis=0), q2.dtype)                # [H, heads]
    logits_eh = ((q_dst * k_j) @ bh) / math.sqrt(ch)              # [E, heads]
    if edge_mask is not None:
        logits_eh = jnp.where(edge_mask[:, None] > 0, logits_eh, _NEG)
    lm_w = jax.ops.segment_max(jax.lax.stop_gradient(logits_eh), dst_w, R)
    if R == n:
        local_max = lm_w
    else:  # out-of-window rows must not poison the pmax: fill with _NEG
        local_max = jax.lax.dynamic_update_slice(
            jnp.full((n, heads), _NEG, lm_w.dtype), lm_w,
            (r_lo, jnp.int32(0)))
    seg_max = jnp.maximum(jax.lax.pmax(local_max, axis_name), _NEG)
    seg_max = jax.lax.stop_gradient(seg_max)
    expd_eh = jnp.exp(logits_eh - seg_max[dst])
    if edge_mask is not None:
        expd_eh = expd_eh * edge_mask[:, None]
    # per-head scalar → its ch channels (0/1 expansion GEMM keeps 2-D)
    expd_h = expd_eh @ bh.T                                       # [E, H]

    r_full = x @ params.w_skip + params.b_skip

    # denominator rides a 128-lane pad of the per-head exps (cheaper than
    # duplicating it across all H channels in the windowed stream)
    expd_pad = jnp.pad(expd_eh, ((0, 0), (0, 128 - heads)))

    if dropout_rate > 0.0 and dropout_rng is not None:
        # α must normalize with the GLOBAL denominator before dropout
        d_p = csr_segment_sum(expd_pad, starts_w, dst_w, e_loc, table_width,
                              _interp, win64)                     # [R, 128]
        denom = jnp.maximum(jax.lax.psum(expand(d_p)[:, :heads], axis_name),
                            1e-16)
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis_name)),
            1.0 - dropout_rate, logits_eh.shape)
        keep_h = keep.astype(expd_h.dtype) @ bh.T
        denom_w = (denom if R == n
                   else jax.lax.dynamic_slice(denom, (r_lo, jnp.int32(0)),
                                              (R, heads)))
        denom_e = csr_gather(denom_w @ bh.T, dst_w, starts_w, table_width,
                             _interp, win64)                      # [E, H]
        alpha_h = expd_h * keep_h / ((1.0 - dropout_rate) * denom_e)
        local_agg = expand(csr_segment_sum(v_j * alpha_h, starts_w, dst_w,
                                           e_loc, table_width, _interp,
                                           win64))                # [N, H]

        def combine(r0, r1):
            return jax.lax.psum(local_agg[r0:r1], axis_name)
    else:
        # Σ exp·v ‖ Σ exp (128-lane tail) in ONE windowed pass
        part = expand(csr_segment_sum(
            jnp.concatenate([v_j * expd_h, expd_pad], 1),
            starts_w, dst_w, e_loc, table_width, _interp, win64))

        def combine(r0, r1):
            st = jax.lax.psum(part[r0:r1], axis_name)
            dn = jnp.maximum(st[:, hidden:hidden + heads], 1e-16)
            return st[:, :hidden] / (dn @ bh.T.astype(st.dtype))

    n_chunks = max(int(comm_chunks), 1)
    bounds = [i * n // n_chunks for i in range(n_chunks + 1)]
    outs = []
    for c in range(n_chunks):
        r0, r1 = bounds[c], bounds[c + 1]
        if r0 == r1:
            continue
        msg = combine(r0, r1).astype(x.dtype)
        rr = r_full[r0:r1]
        out = beta_blend(params.w_beta, rr, msg)
        outs.append(row_post(out, r0, r1) if row_post is not None else out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def sharded_trunk(params: Params, cfg, batch, *, axis_name: str,
                  train: bool = False, rng: Optional[jax.Array] = None,
                  comm_chunks: int = 1,
                  table_widths: Optional[tuple] = None,
                  impl: Optional[str] = None,
                  row_windows: Optional[tuple] = None) -> jnp.ndarray:
    """Edge-sharded equivalent of `models.alignn._shared_trunk`.

    `batch` carries node/graph arenas replicated and edge/LG arenas sharded
    on their leading axis. Bond *states* are materialized replicated via an
    all-gather of the locally-encoded slice. `comm_chunks` > 1 pipelines
    each conv's all-reduce against its row-local epilogue (LayerNorm,
    residual, dropout) — see `edge_sharded_conv`; results are
    chunk-count-invariant (residual dropout masks are drawn full-size and
    sliced per chunk).

    `table_widths=(atom_w, lg_w)` switches both convs' local reductions to
    the scatter-free windowed-kernel formulation (see `_windowed_conv`;
    `impl` can force 'table' or 'coo' instead); the widths MUST dominate
    every real row's span — measure them on the staged batches with
    `train_step.measure_table_widths`. None keeps the COO segment ops
    (always safe).
    """
    drop = cfg.dropout if train else 0.0
    atom_w, lg_w = table_widths if table_widths is not None else (0, 0)
    atom_r, lg_r = row_windows if row_windows is not None else (0, 0)
    if impl is None:
        impl = "windowed" if table_widths is not None else "coo"

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
            row_post=make_post(eb, edge_state, has_lg, next_key()),
            row_ptr=batch.lg_row_ptr, table_width=lg_w, impl=impl,
            win64=getattr(cfg, "lg_win64", 0), row_window=lg_r)

        # atom conv consumes the local slice of projected bond states
        local_rows = jax.lax.dynamic_slice_in_dim(
            edge_state, my_shard * e_local, e_local, axis=0)
        edge_feat = local_rows @ nb["edge_proj_w"] + nb["edge_proj_b"]
        node_state = edge_sharded_conv(
            nb["conv"], node_state, batch.edge_src, batch.edge_dst, edge_feat,
            heads=cfg.heads, axis_name=axis_name, edge_mask=batch.edge_mask,
            dropout_rate=drop, dropout_rng=next_key(),
            comm_chunks=comm_chunks,
            row_post=make_post(nb, node_state, has_edges, next_key()),
            row_ptr=batch.edge_row_ptr, table_width=atom_w, impl=impl,
            win64=getattr(cfg, "edge_win64", 0), row_window=atom_r)

    n_graphs = batch.y.shape[0]
    pooled = segment_mean(node_state, batch.node_graph, n_graphs + 1)[:n_graphs]
    sg_one_hot = jax.nn.one_hot(batch.sg_num - 1, N_SG, dtype=pooled.dtype)
    feats = jnp.concatenate([pooled, batch.globals_, sg_one_hot], axis=-1)
    feats = _dropout(feats, drop, next_key())
    shared = jax.nn.relu(feats @ params["feat_proj"]["w"] + params["feat_proj"]["b"])
    return _dropout(shared, drop, next_key())


def sharded_apply(params: Params, cfg, batch, *, axis_name: str,
                  train: bool = False, rng: Optional[jax.Array] = None,
                  comm_chunks: int = 1, table_widths: Optional[tuple] = None,
                  impl: Optional[str] = None,
                  row_windows: Optional[tuple] = None):
    shared = sharded_trunk(params, cfg, batch, axis_name=axis_name,
                           train=train, rng=rng, comm_chunks=comm_chunks,
                           table_widths=table_widths, impl=impl,
                           row_windows=row_windows)
    mean = shared @ params["mean_head"]["w"] + params["mean_head"]["b"]
    logvar = shared @ params["logvar_head"]["w"] + params["logvar_head"]["b"]
    return mean, logvar
