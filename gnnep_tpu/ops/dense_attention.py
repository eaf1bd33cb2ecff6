"""Dense padded-adjacency graph attention — the TPU fast path.

Same math as `ops.graph_attention.transformer_conv` (β-gated UniMP conv),
but aggregation uses the batch's *dense incoming-edge tables*: every node's
incoming edge slots live in a fixed-width row `table[n, :D]`, so the
attention softmax is a plain masked softmax over the degree axis and the
message aggregate a plain einsum — **no XLA scatter appears in forward or
backward**. Scatter-adds with duplicate indices execute row-serially on TPU
(the single biggest perf cliff for message passing); here every index map is
either a streaming gather or its precomputed inverse (`pos`), so both passes
stay on the vector units.

Layout rules that matter on TPU (see PERF.md): every wide intermediate stays
2-D [·, H] (3-D [E, heads, ch] shapes tile-pad 4×), q/k/v/skip run as one
[H_in, 4H] GEMM, and per-head reductions are 0/1 block-sum GEMMs. The
production path hands the softmax-aggregate mid-section to the fused Pallas
kernel (`ops/pallas/csr_attention.py`); the table formulation here is both
the off-TPU fallback and the kernel's scatter-free VJP reference.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .graph_attention import TransformerConvParams, beta_blend
from .segment import gather_rows

_NEG = -1e30

_WARNED: set = set()


def _warn_downgrade(msg: str) -> None:
    """Warn ONCE per distinct message: a silently-downgraded kernel request
    (e.g. fused → table on unaligned hidden/heads) costs ~10× throughput,
    which users should learn from a log line, not a profiler."""
    if msg not in _WARNED:
        _WARNED.add(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


@jax.custom_vjp
def table_gather(edge_vals: jnp.ndarray, in_edges: jnp.ndarray,
                 pos: jnp.ndarray) -> jnp.ndarray:
    """`edge_vals[in_edges]` with a pure-gather backward.

    `in_edges` is [N, D] (each real edge appears in exactly one slot) and
    `pos` its inverse map ([E] flat slot per edge, padded edges pointing at
    an always-masked slot). The VJP therefore gathers the cotangent at `pos`
    instead of letting XLA transpose the gather into a scatter.
    """
    return edge_vals[in_edges]


def _table_gather_fwd(edge_vals, in_edges, pos):
    return edge_vals[in_edges], (in_edges.shape, pos)


def _table_gather_bwd(res, g):
    (n, d), pos = res
    flat = g.reshape((n * d,) + g.shape[2:])
    return flat[pos], None, None


table_gather.defvjp(_table_gather_fwd, _table_gather_bwd)



def transformer_conv_table(
    params: TransformerConvParams,
    x: jnp.ndarray,             # [N, H_in] states of the aggregation arena
    src: jnp.ndarray,           # [E] message sources
    dst: jnp.ndarray,           # [E] aggregation targets
    edge_attr: jnp.ndarray,     # [E, F_e]
    in_edges: jnp.ndarray,      # [N, D] dense incoming table
    in_mask: jnp.ndarray,       # [N, D]
    pos: jnp.ndarray,           # [E] inverse table map
    out_edges: Optional[jnp.ndarray] = None,  # [N, Do] outgoing table
    out_mask: Optional[jnp.ndarray] = None,
    src_order: Optional[jnp.ndarray] = None,   # [E] permutation sorting by src
    src_starts: Optional[jnp.ndarray] = None,  # [N] segment starts in that order
    *,
    heads: int,
    edge_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    fused: bool = False,
    win64: int = 0,
    src_win64: int = 0,  # row bound per 64 segments of the SRC-sorted arena
    row_ptr: Optional[jnp.ndarray] = None,  # [N+1] CSR pointers of dst
    attn_fused: bool = True,   # fully fused attention (q·k SDDMM in-kernel)
    attn_eproj: bool = True,   # in-kernel edge projection
    force_fused: bool = False,  # keep kernels active off-TPU (interpret mode)
    attn_span: bool = False,   # node-space kv + in-kernel gather (span form)
    span_lo: Optional[jnp.ndarray] = None,  # [N] monotone per-target span lo
    span64: int = 0,           # pack-time-measured static span bound
) -> jnp.ndarray:
    n = x.shape[0]
    hidden = params.w_query.shape[1]
    ch = hidden // heads

    # one fused [H_in, 4H] projection for q/k/v/skip (4 GEMMs → 1); all wide
    # tensors stay 2-D [·, H] — [E, heads, ch] layouts pad heads→8 and
    # ch→128 on TPU tiles, quadrupling their memory footprint
    w_all = jnp.concatenate([params.w_query, params.w_key, params.w_value,
                             params.w_skip], axis=1)
    b_all = jnp.concatenate([params.b_query, params.b_key, params.b_value,
                             params.b_skip])
    proj = x @ w_all + b_all
    q = proj[:, :hidden]
    r = proj[:, 3 * hidden:]

    # gathers of (k‖v) by src and q by dst; both VJPs route through the
    # windowed Pallas segment-sum when the CSR layouts allow it (the XLA
    # transpose is a row-serial scatter-add — the dominant backward cost),
    # falling back to gather_rows' sort-based segment-sum otherwise. (A
    # dense-table VJP was tried and measured slower — see PERF.md.)
    from .pallas.csr_attention import (attn_eproj_fusable, attn_fusable,
                                       attn_span_fusable, fused_attention,
                                       fused_attention_eproj,
                                       fused_attention_span)
    from .pallas.csr_attention import fusable as _sum_ok
    from .pallas.csr_attention import csr_gather, csr_gather_ordered

    e_total = src.shape[0]
    _interp = jax.default_backend() != "tpu"
    # real-hardware Mosaic rejects slim lane slices (e.g. per-head window
    # slices at ch < 64, sub-128-lane arenas); interpret mode accepts them,
    # so small test configs keep kernel coverage while hardware runs with
    # unaligned hidden/ch fall back to the dense-table path
    lane_ok = _interp or (hidden % 128 == 0 and ch % 64 == 0)
    if fused and not lane_ok:
        _warn_downgrade(
            f"conv_impl='fused' requested but hidden={hidden}/heads={heads} "
            f"(per-head ch={ch}) fails the TPU lane-alignment requirements "
            "(hidden % 128 == 0 and ch % 64 == 0); running the dense-table "
            "path instead. Pick hidden/heads with ch a multiple of 64 "
            "(e.g. hidden 128 with 2 heads) to keep the Pallas kernels.")
    fuse_gathers = fused and lane_ok and (not _interp or force_fused)
    # fully fused attention (q·k SDDMM in-kernel): no q gather, no [E, heads]
    # logits tensor, no edge-mask stream — padded edges (dst = dummy) are
    # excluded from real rows by CSR membership alone. Default since the
    # kernels got win64 window bounds + bf16 windows + double-buffered DMA
    # (12.2 vs 13.3 ms/step against the external-logits boundary — see
    # PERF.md); attn_fused=False reverts to the external-logits path.
    use_attn = (fused and lane_ok and attn_fused
                and attn_fusable(n, e_total, in_edges.shape[1],
                                 hidden=hidden, win64=win64))
    # one level deeper: the edge projection e = edge_attr·W_e and the k/v
    # adds move in-kernel too — no [E, H] e tensor, no k_j/v_j slice_add
    # round trip, backward emits dkv/d(edge_attr)/dW_e directly
    # (attn_eproj=False reverts to the kv+e boundary)
    use_eproj = (use_attn and attn_eproj
                 and (_interp or edge_attr.shape[1] % 128 == 0)
                 and attn_eproj_fusable(
                     n, e_total, in_edges.shape[1], hidden=hidden,
                     fe=edge_attr.shape[1], win64=win64,
                     itemsize=jnp.dtype(x.dtype).itemsize))
    # one level deeper again: the kv GATHER moves in-kernel too (span
    # formulation) — no [E, 2H] edge-space kv in either pass, the backward
    # emits d(kv) in node space directly
    use_span = (use_eproj and attn_span and span_lo is not None
                and attn_span_fusable(
                    n, x.shape[0], e_total, in_edges.shape[1], hidden=hidden,
                    fe=edge_attr.shape[1], span=span64, win64=win64,
                    itemsize=jnp.dtype(x.dtype).itemsize))
    e = None if use_eproj else edge_attr @ params.w_edge   # [E, H]
    # rate may be traced (per-member dropout); concrete zero disables
    use_dropout = dropout_rng is not None and not (
        isinstance(dropout_rate, (int, float)) and dropout_rate <= 0.0)
    if use_span:
        kv = None                      # no edge-space kv exists on this path
        q_dst = None
        if row_ptr is None:
            row_ptr = jnp.searchsorted(dst, jnp.arange(n + 1, dtype=dst.dtype)
                                       ).astype(jnp.int32)
    elif (fuse_gathers and src_order is not None and src_starts is not None
            and out_edges is not None
            and _sum_ok(src_starts.shape[0], e_total, out_edges.shape[1],
                        hidden=2 * hidden, win64=src_win64)
            and _sum_ok(n, e_total, in_edges.shape[1], hidden=hidden,
                        win64=win64)):
        kv = csr_gather_ordered(proj[:, hidden:3 * hidden], src, src_order,
                                src_starts, out_edges.shape[1], _interp,
                                src_win64)
        if row_ptr is None:
            row_ptr = jnp.searchsorted(dst, jnp.arange(n + 1, dtype=dst.dtype)
                                       ).astype(jnp.int32)
        q_dst = None if use_attn else csr_gather(
            q, dst, row_ptr[:-1], in_edges.shape[1], _interp, win64)
    else:
        kv = gather_rows(proj[:, hidden:3 * hidden], src)
        q_dst = None if use_attn else gather_rows(q, dst)

    if use_attn:
        scale_t = None
        if use_dropout:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                        (heads, e_total))
            scale_t = keep.astype(jnp.float32) / (1.0 - dropout_rate)
        if row_ptr is None:
            row_ptr = jnp.searchsorted(dst, jnp.arange(n + 1, dtype=dst.dtype)
                                       ).astype(jnp.int32)
        # q/k/v stay in the compute dtype — the kernels window them as-is
        # (bf16 halves DMA bytes and runs native-bf16 MXU contractions)
        if use_span:
            msg = fused_attention_span(
                q, proj[:, hidden:3 * hidden], edge_attr, params.w_edge,
                row_ptr, src, span_lo, heads=heads,
                max_in_degree=in_edges.shape[1], span=span64,
                scale_t=scale_t, mask_e=edge_mask,
                win64=win64).astype(x.dtype)
        elif use_eproj:
            msg = fused_attention_eproj(
                q, kv, edge_attr, params.w_edge, row_ptr, dst, heads=heads,
                max_in_degree=in_edges.shape[1], scale_t=scale_t,
                mask_e=edge_mask, win64=win64).astype(x.dtype)
        else:
            msg = fused_attention(
                q, kv[:, :hidden] + e, kv[:, hidden:] + e, row_ptr, dst,
                heads=heads, max_in_degree=in_edges.shape[1], scale_t=scale_t,
                mask_e=edge_mask, win64=win64).astype(x.dtype)
        return beta_blend(params.w_beta, r, msg)

    k_j = kv[:, :hidden] + e                           # [E, H]
    v_j = kv[:, hidden:] + e

    import numpy as _np

    use_fused = fused and lane_ok and _sum_ok(n, src.shape[0],
                                              in_edges.shape[1],
                                              hidden=hidden, win64=win64)
    if use_fused:
        # Pallas fused path (requires CSR-sorted edges). The logit family
        # lives in [heads, E] layout end-to-end: an [E, heads] tensor
        # lane-pads 4 → 128 on TPU tiles (32× HBM amplification), while
        # [heads, E] only sublane-pads 4 → 8. The per-head reduction is the
        # transposed block-sum GEMM [heads, H] × [E, H]ᵀ → [heads, E]; its
        # VJP is another GEMM, so no slim [E, heads] tensor exists in
        # forward or backward. f32 output (softmax exp precision); the
        # value arena keeps the compute dtype — under bf16 the kernels
        # read half the window bytes and aggregate on the bf16 MXU path.
        blocksum_t = jnp.asarray(_np.repeat(_np.eye(heads, dtype=_np.float32),
                                            ch, axis=1), dtype=q.dtype)  # [h, H]
        logits_t = jax.lax.dot_general(
            blocksum_t, q_dst * k_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / math.sqrt(ch)  # [heads, E]
        if edge_mask is not None:
            logits_t = jnp.where(edge_mask[None, :] > 0, logits_t, _NEG)
        scale_t = None
        if use_dropout:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                        logits_t.shape)
            scale_t = keep.astype(jnp.float32) / (1.0 - dropout_rate)
        if row_ptr is None:
            row_ptr = jnp.searchsorted(dst, jnp.arange(n + 1, dtype=dst.dtype)
                                       ).astype(jnp.int32)
        from .pallas.csr_attention import fused_aggregate_t
        msg = fused_aggregate_t(
            logits_t, v_j, row_ptr, dst=dst, heads=heads,
            max_in_degree=in_edges.shape[1], win64=win64,
            scale_t=scale_t).astype(x.dtype)
    else:
        # per-head logit reduction as a block-sum GEMM (keeps the product 2-D)
        blocksum = jnp.asarray(_np.repeat(_np.eye(heads, dtype=_np.float32),
                                          ch, axis=0), dtype=q.dtype)  # [H, h]
        logits_e = ((q_dst * k_j) @ blocksum) / math.sqrt(ch)
        if edge_mask is not None:
            logits_e = jnp.where(edge_mask[:, None] > 0, logits_e, _NEG)
        logits_t = table_gather(logits_e, in_edges, pos)   # [N, D, h]
        logits_t = jnp.where(in_mask[..., None] > 0, logits_t, _NEG)
        logits_t = logits_t - jax.lax.stop_gradient(
            jnp.max(logits_t, axis=1, keepdims=True))
        # mask in the COMPUTE dtype: batch masks are f32 arrays, and an f32
        # multiplicand silently promotes the whole [N, D, ·] softmax +
        # aggregation family (and thence the layer states) to f32 under
        # bf16 — doubling the table path's bandwidth and breaking the
        # scan_layers carry-dtype contract
        expd = jnp.exp(logits_t) * in_mask[..., None].astype(logits_t.dtype)
        alpha = expd / jnp.maximum(expd.sum(axis=1, keepdims=True), 1e-16)
        if use_dropout:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                        alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)

        v_t = table_gather(v_j, in_edges, pos)             # [N, D, H]
        v_t = v_t.reshape(n, in_edges.shape[1], heads, ch)
        msg = jnp.einsum("ndh,ndhc->nhc", alpha, v_t).reshape(n, hidden)

    return beta_blend(params.w_beta, r, msg)
