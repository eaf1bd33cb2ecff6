"""Fused CSR segment-softmax + weighted aggregation — Pallas TPU kernel.

The hot mid-section of every graph conv is: per aggregation target, softmax
its incoming edges' logits, apply attention dropout, and reduce the weighted
values. XLA executes this as separate gather / exp / sum / einsum ops, each
round-tripping an [E, H]-sized tensor through HBM (measured ~10 % of HBM
bandwidth per conv). This kernel fuses the whole reduction:

- edge arenas are CSR-sorted by destination (see `data.batching`), so the
  edges of a block of `BN` consecutive targets occupy one contiguous window
  of at most `cap = BN · max_in_degree` rows
- per grid step, the window of per-edge logits, dropout scales, and values
  is DMA'd into VMEM once; segment membership is a broadcasted-iota
  comparison against the block's row pointers; the masked softmax runs
  in-register and the weighted aggregation is a per-head [BN, cap] × [cap, c]
  MXU matmul
- nothing of size [E, ·] is re-materialized in HBM

Attention dropout enters as a per-edge post-softmax scale (0 or 1/(1-p))
generated with the host-side PRNG, so forward and backward see the same
mask. The custom VJP recomputes α with the dense-table formulation (pure
gathers, no scatter) — the forward is the bandwidth-critical piece.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(starts_ref,            # SMEM scalar-prefetch: [n_blocks] window starts
            rp_lo_ref, rp_hi_ref,  # [BN] row-pointer begin/end for this block
            logits_hbm,            # [heads, E] in ANY/HBM
            scale_hbm,             # [heads, E] post-softmax scales (dropout)
            v_hbm,                 # [E, H]
            out_ref,               # [BN, H] VMEM output block
            stats_ref,             # [BN, 256]: max in cols 0:heads, denom in
                                   # cols 128:128+heads (lane-aligned packing)
            l_win, s_win, v_win, sems,
            *, bn: int, cap: int, heads: int, ch: int):
    """Double-buffered: each scratch window is [2, ...]; block i computes
    from slot i%2 while block i+1's DMA streams into slot (i+1)%2. The
    kernels were DMA-latency-bound (start→wait→compute serialization), not
    bandwidth-bound — overlap recovers most of the wait."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def copies(idx, s):
        # host guarantees 128-aligned window starts; Mosaic needs the hint
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(logits_hbm.at[:, pl.ds(st, cap)],
                                      l_win.at[s], sems.at[s, 0]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 1]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(st, cap)],
                                      v_win.at[s], sems.at[s, 2]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    start = pl.multiple_of(starts_ref[i], 128)
    lo = rp_lo_ref[i, :] - start                   # [BN] window-local begin
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])   # [BN, cap]

    for cp in copies(i, slot):
        cp.wait()
    l_cur = l_win.at[slot]
    s_cur = s_win.at[slot]
    v_cur = v_win.at[slot]

    mxs = []
    dens = []
    for h in range(heads):
        mat = jnp.where(member, l_cur[h, :][None, :], _NEG)  # [BN, cap]
        mx = jnp.maximum(jnp.max(mat, axis=1, keepdims=True), _NEG)
        # the > _NEG/2 clamp keeps masked logits (−1e30) at weight 0 even in
        # all-masked segments (mx = −1e30 → exp(0) would otherwise be 1) —
        # interior masked rows exist once the packer dilutes dense blocks
        e = jnp.where(mat > 0.5 * _NEG, jnp.exp(mat - mx), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        alpha = (e / denom) * s_cur[h, :][None, :]
        # under bf16 compute the value window arrives bf16 — half the DMA
        # bytes and a native-bf16 MXU aggregation (f32 accumulate)
        out_ref[:, h * ch:(h + 1) * ch] = jnp.dot(
            alpha.astype(v_cur.dtype), v_cur[:, h * ch:(h + 1) * ch],
            preferred_element_type=jnp.float32)
        mxs.append(mx)
        dens.append(denom)
    # stats packed into one 2x128-lane block (narrow outputs are illegal
    # Mosaic slices); cols 0:heads = max, 128:128+heads = denom
    pad = jnp.zeros((bn, 128 - heads), jnp.float32)
    stats_ref[:, :] = jnp.concatenate(
        [*mxs, pad, *dens, pad], axis=1)


def _window_starts(row_ptr, block_n: int, cap: int, e_total: int):
    """128-aligned-down per-block window starts, clamped to the arena.

    Mosaic requires lane-dim slices to be 128-aligned; cap carries the +128
    margin so an aligned-down start still covers the block's full edge
    range, and e_total % 128 == 0 keeps the clamped tail start aligned too.
    """
    block_starts = row_ptr[:-1:block_n]
    return jnp.minimum((block_starts // 128) * 128,
                       jnp.maximum(e_total - cap, 0)).astype(jnp.int32)


def _pallas_forward_t(logits_t, scale_t, v_j, row_ptr, *, heads: int,
                      block_n: int, cap: int, interpret: bool) -> jnp.ndarray:
    """Forward over pre-transposed [heads, E] logits/scale arenas."""
    e_total, hidden = v_j.shape
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            # row pointers as [n_blocks, BN] (1-D s32 operands get a T(1024)
            # XLA layout Mosaic rejects); the whole 30 KB table rides along
            # each step and the kernel row-indexes it by program id, which
            # satisfies the block-shape divisibility rule
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec((block_n, 256), lambda i, s: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, cap, hidden), v_j.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(_kernel, bn=block_n, cap=cap, heads=heads, ch=ch)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), logits_t, scale_t, v_j)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def csr_softmax_aggregate(logits_t, scale_t, v_j, row_ptr, dst, heads,
                          block_n, cap, interpret, max_in_degree, win64):
    """Segment softmax-aggregate over [heads, E] logit/scale arenas.

    The [heads, E] layout is load-bearing: an [E, heads] tensor lane-pads
    4 → 128 on TPU tiles (32× HBM amplification on every slim tensor
    crossing this boundary, forward and backward), while [heads, E] only
    sublane-pads 4 → 8. Callers produce logits directly in this layout via
    a transposed block-sum GEMM (see `dense_attention`)."""
    return _pallas_forward_t(logits_t, scale_t, v_j, row_ptr, heads=heads,
                             block_n=block_n, cap=cap, interpret=interpret)[0]


def _fwd(logits_t, scale_t, v_j, row_ptr, dst, heads,
         block_n, cap, interpret, max_in_degree, win64):
    out, stats = _pallas_forward_t(logits_t, scale_t, v_j, row_ptr,
                                   heads=heads, block_n=block_n, cap=cap,
                                   interpret=interpret)
    return out, (logits_t, scale_t, v_j, dst, row_ptr, stats)


def _bwd_kernel(starts_ref,            # SMEM: [n_blocks] window starts
                rp_lo_ref, rp_hi_ref,  # [BN] row-pointer begin/end
                logits_hbm,            # [heads, E] ANY
                scale_hbm,             # [heads, E] ANY
                v_hbm,                 # [E, H] ANY
                g_ref,                 # [BN, H] VMEM block (out cotangent)
                stats_ref,             # [BN, 256] VMEM block (fwd softmax stats)
                dl0_hbm, dv0_hbm,      # zero-init arenas aliased to outputs
                dl_out,                # [heads, E] ANY output
                dv_out,                # [E, H] ANY output
                l_win, s_win, v_win, dl_acc, dv_acc, sems,
                *, bn: int, cap: int, heads: int, ch: int):
    """Fused backward for the segment softmax-aggregate.

    Recomputes the softmax matrix S[n, e] in-register from the forward's
    saved (max, denom) stats, then per head runs the two MXU contractions
    U = g·vᵀ (SDDMM) and dv = Aᵀ·g inside the window, plus the row
    reductions for `inner` and the column collapse for dlogits. Edge-space
    outputs are accumulated into zero-initialized arenas with overlapping
    read-modify-write windows — safe because TPU grids execute
    sequentially, so each block folds its member-masked contribution into
    whatever earlier blocks already wrote.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    start = pl.multiple_of(starts_ref[i], 128)

    def copies(idx, s):
        # double-buffered input windows (see `_kernel`)
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(logits_hbm.at[:, pl.ds(st, cap)],
                                      l_win.at[s], sems.at[s, 0]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 1]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(st, cap)],
                                      v_win.at[s], sems.at[s, 2]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    # RMW reads of the current output content (zeros + earlier blocks'
    # writes) — inherently serialized: block i-1's writeback completed
    # before this body runs (TPU grids execute sequentially)
    cp_dl = pltpu.make_async_copy(dl_out.at[:, pl.ds(start, cap)], dl_acc,
                                  sems.at[0, 3])
    cp_dv = pltpu.make_async_copy(dv_out.at[pl.ds(start, cap)], dv_acc,
                                  sems.at[0, 4])
    cp_dl.start()
    cp_dv.start()

    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])   # [BN, cap]

    for cp in copies(i, slot):
        cp.wait()
    cp_dl.wait()
    cp_dv.wait()
    l_cur = l_win.at[slot]
    s_cur = s_win.at[slot]
    v_cur = v_win.at[slot]

    stats = stats_ref[:, :]
    dl_rows = []
    for h in range(heads):
        mat = jnp.where(member, l_cur[h, :][None, :], _NEG)       # [BN, cap]
        mx = stats[:, h:h + 1]
        den = stats[:, 128 + h:129 + h]
        # the > _NEG/2 clamp keeps masked logits (−1e30) at S=0 even when a
        # row's max is itself −1e30 (all-masked segments)
        s_mat = jnp.where(mat > 0.5 * _NEG, jnp.exp(mat - mx), 0.0) / den
        sc = s_cur[h, :][None, :]
        a_mat = s_mat * sc                                        # α·dropout
        g_h = g_ref[:, h * ch:(h + 1) * ch]                       # [BN, ch]
        v_h = v_cur[:, h * ch:(h + 1) * ch]                       # [cap, ch]
        u_mat = jax.lax.dot_general(                              # [BN, cap]
            g_h.astype(v_h.dtype), v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w_mat = sc * u_mat
        inner = jnp.sum(a_mat * u_mat, axis=1, keepdims=True)     # [BN, 1]
        dl_mat = s_mat * (w_mat - inner)                          # [BN, cap]
        # each window column has at most one member row (S=0 elsewhere)
        dl_rows.append(jnp.sum(dl_mat, axis=0, keepdims=True))    # [1, cap]
        dv_h = jax.lax.dot_general(                               # [cap, ch]
            a_mat.astype(v_h.dtype), g_h.astype(v_h.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[:, h * ch:(h + 1) * ch] = (
            dv_acc[:, h * ch:(h + 1) * ch] + dv_h.astype(dv_acc.dtype))
    dl_acc[:, :] = dl_acc[:, :] + jnp.concatenate(dl_rows, axis=0)

    wb_l = pltpu.make_async_copy(dl_acc, dl_out.at[:, pl.ds(start, cap)],
                                 sems.at[0, 3])
    wb_v = pltpu.make_async_copy(dv_acc, dv_out.at[pl.ds(start, cap)],
                                 sems.at[0, 4])
    wb_l.start()
    wb_v.start()
    # writes must land before the next (sequential) block's RMW read
    wb_l.wait()
    wb_v.wait()


def _pallas_backward_t(logits_t, scale_t, v_j, row_ptr, g, stats, *,
                       heads: int, block_n: int, cap: int, interpret: bool):
    """Host wrapper: returns (dlogits_t [heads, E], dv [E, H])."""
    e_total, hidden = v_j.shape
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
            pl.BlockSpec((block_n, 256), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, cap, hidden), v_j.dtype),
            pltpu.VMEM((heads, cap), jnp.float32),
            pltpu.VMEM((cap, hidden), v_j.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, bn=block_n, cap=cap, heads=heads,
                               ch=ch)
    dl0 = jnp.zeros((heads, e_total), jnp.float32)
    dv0 = jnp.zeros((e_total, hidden), v_j.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((heads, e_total), jnp.float32),
                   jax.ShapeDtypeStruct((e_total, hidden), v_j.dtype)),
        # flat inputs: starts, rp_lo, rp_hi, logits, scale, v, g, stats, dl0, dv0
        input_output_aliases={8: 0, 9: 1},
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), logits_t, scale_t, v_j,
      g.astype(jnp.float32), stats, dl0, dv0)


def _bwd(heads, block_n, cap, interpret, max_in_degree, win64, res, g):
    """Scatter-free, edge-space backward.

    With post-softmax scale m: out_n = Σ_{e→n} s_e m_e v_e for s = softmax(l)
    within each segment, so dl_e = s_e (m_e u_e − inner_n) with u_e = <g_n,
    v_e> and inner_n = Σ s m u, and dv_e = s_e m_e g_n. Preferred path: the
    fused backward kernel (everything in one VMEM-windowed pass). Fallback
    (backward VMEM budget unmet): XLA edge-space streams with the windowed
    segment-sum for `inner`.
    """
    logits_t, scale_t, v_j, dst, row_ptr, stats = res
    e_total, hidden = v_j.shape
    n = row_ptr.shape[0] - 1
    ch = hidden // heads

    bn_b = pick_block_n_bwd(n, e_total, max_in_degree, hidden, win64=win64)
    if bn_b is not None:
        cap_b = _win_cap(bn_b, max_in_degree, e_total, win64)
        dl_t, dv = _pallas_backward_t(logits_t, scale_t, v_j, row_ptr, g,
                                      stats, heads=heads, block_n=bn_b,
                                      cap=cap_b, interpret=interpret)
        return (dl_t, None, dv, None, None)

    mx = stats[:, :heads]
    denom = stats[:, 128:128 + heads]
    logits_e = logits_t.T
    scale_e = scale_t.T
    s_e = jnp.exp(logits_e - mx[dst]) / denom[dst]       # [E, h] pre-dropout α
    g_e = g[dst]                                         # [E, H]
    sm = s_e * scale_e
    dv = (jnp.repeat(sm, ch, axis=1) * g_e).astype(v_j.dtype)  # [E, H]
    # per-head <g, v> as a 2-D block-sum GEMM (no [E, h, c] tiling waste)
    blocksum = jnp.asarray(np.repeat(np.eye(heads, dtype=np.float32), ch,
                                     axis=0))            # [H, heads]
    u_e = (g_e * v_j.astype(jnp.float32)) @ blocksum     # [E, h]
    w_e = scale_e * u_e
    # pad the slim [E, heads] tensor to a full 128-lane tile — narrow dim-1
    # windows are illegal Mosaic slices
    sw = jnp.pad(s_e * w_e, ((0, 0), (0, 128 - heads)))
    inner = windowed_segment_sum(sw, row_ptr[:-1], e_total,
                                 max_deg=max_in_degree,
                                 interpret=interpret, win64=win64)[:, :heads]
    dlogits = s_e * (w_e - inner[dst])
    return (dlogits.T, None, dv, None, None)


csr_softmax_aggregate.defvjp(_fwd, _bwd)


def fused_aggregate_t(logits_t: jnp.ndarray, v_j: jnp.ndarray,
                      row_ptr: jnp.ndarray, *,
                      dst: jnp.ndarray, heads: int,
                      max_in_degree: int,
                      scale_t: Optional[jnp.ndarray] = None,
                      block_n: int = 128,
                      win64: int = 0,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused segment softmax-aggregate over CSR-sorted edges.

    `logits_t` / `scale_t` are [heads, E] (see `csr_softmax_aggregate` on
    why that layout); `scale_t` applies post-softmax (attention dropout) and
    defaults to ones. Requires n % block_n == 0 and window capacity ≤ E —
    callers fall back to the dense-table path otherwise (see `fusable`).
    `win64` is an optional guarantee that any aligned group of 64
    consecutive targets owns at most that many edge rows — it shrinks the
    VMEM windows (and every window matmul) well below the worst-case
    block·max_in_degree.

    NOTE: the reserved dummy row (index n-1) owns the padded edges under the
    CSR convention, so its output is unspecified (it aggregates padding).
    That row is masked out of pooling and never gathered by real edges.
    """
    n = row_ptr.shape[0] - 1
    e_total = v_j.shape[0]
    hidden = v_j.shape[1]
    block_n = pick_block_n(n, e_total, max_in_degree, hidden, block_n,
                           win64=win64)
    if block_n is None:
        raise ValueError("fused_aggregate preconditions not met")
    cap = _win_cap(block_n, max_in_degree, e_total, win64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale_t is None:
        scale_t = jnp.ones_like(logits_t)
    return csr_softmax_aggregate(logits_t, scale_t, v_j, row_ptr, dst,
                                 heads, block_n, cap, interpret,
                                 max_in_degree, win64)


def fused_aggregate(logits_e: jnp.ndarray, v_j: jnp.ndarray,
                    row_ptr: jnp.ndarray, in_edges: jnp.ndarray,
                    in_mask: jnp.ndarray, pos: jnp.ndarray, *,
                    dst: jnp.ndarray, heads: int,
                    max_in_degree: int,
                    scale_e: Optional[jnp.ndarray] = None,
                    block_n: int = 128,
                    win64: int = 0,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """[E, heads]-layout convenience wrapper around `fused_aggregate_t`.

    Production code should build logits in [heads, E] directly (transposing
    here costs a lane-padded [E, heads] round trip). `in_edges`/`in_mask`/
    `pos` are accepted for signature compatibility but unused — the kernel
    needs only the CSR row pointers."""
    del in_edges, in_mask, pos
    return fused_aggregate_t(
        logits_t=logits_e.T, v_j=v_j, row_ptr=row_ptr, dst=dst, heads=heads,
        max_in_degree=max_in_degree,
        scale_t=None if scale_e is None else scale_e.T,
        block_n=block_n, win64=win64, interpret=interpret)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB VMEM limit


def _win_cap(bn: int, max_deg: int, e_total: int, win64: int = 0) -> int:
    """VMEM window capacity for a block of `bn` targets.

    Two independent upper bounds on the edge-row span of any aligned block:
    bn · max_in_degree (degree worst case), and — when the packer guarantees
    it — (bn/64) · win64 (aligned 64-target groups own ≤ win64 rows; blocks
    of bn ≤ 64 sit inside one group). +128 covers aligning the window start
    down to the 128-lane tile.
    """
    span = bn * max_deg
    if win64:
        span = min(span, (max(bn, 64) // 64) * win64)
    return min(_round_up(span + 128, 128), e_total)


def pick_block_n(n: int, e_total: int, max_in_degree: int, hidden: int,
                 preferred: int = 128, win64: int = 0):
    """Largest power-of-two block size whose window fits the VMEM budget.

    Heavy-tailed in-degrees can push `cap = block·D` past VMEM (the window
    holds [cap, H] values f32 plus two [heads, cap] strips); shrinking the
    node block keeps the kernel viable down to block 8.
    """
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        # a window larger than the arena clamps to the whole arena
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        # double-buffered scratch windows + ~3 live [bn, cap] temporaries
        win_bytes = (2 * (cap * hidden * 4 + 2 * 8 * cap * 4)
                     + bn * hidden * 4 + 3 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def pick_block_n_bwd(n: int, e_total: int, max_in_degree: int, hidden: int,
                     preferred: int = 128, win64: int = 0):
    """Block size for the fused backward kernel (its own VMEM budget:
    double-buffered value windows + the dv accumulator — plus ~6 live
    [bn, cap] softmax/SDDMM temporaries)."""
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (3 * cap * hidden * 4 + 5 * 8 * cap * 4
                     + 2 * bn * max(hidden, 256) * 4 + 6 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def fusable(n: int, e_total: int, max_in_degree: int, block_n: int = 128,
            hidden: int = 256, win64: int = 0) -> bool:
    return pick_block_n(n, e_total, max_in_degree, hidden, block_n,
                        win64=win64) is not None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Fully fused CSR attention: q·k SDDMM + segment softmax + aggregation
# ---------------------------------------------------------------------------

def _attn_kernel(starts_ref, rp_lo_ref, rp_hi_ref,
                 k_hbm, v_hbm, scale_hbm,   # [E, H], [E, H], [heads, E] ANY
                 mask_hbm,                  # [1, E] pre-softmax 0/1 mask ANY
                 q_ref,                     # [BN, H] VMEM block
                 out_ref, stats_ref,        # [BN, H], [BN, 256] VMEM blocks
                 k_win, v_win, s_win, m_win, sems,
                 *, bn: int, cap: int, heads: int, ch: int, inv_sqrt_ch: float):
    """Forward: logits are computed in-kernel as the per-head SDDMM
    q_h · k_hᵀ/√c over the window, so no [E, heads] logits tensor (or its
    lane-padded transposes) ever exists in HBM. Tail padding (dst = dummy)
    is excluded by CSR membership; INTERIOR padding (dilution relocates
    masked rows into real segments with forward-filled dst) is excluded by
    the [1, E] pre-softmax mask stream folded into the member test. The
    dummy row itself aggregates garbage and is unspecified by contract."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def copies(idx, s):
        # double-buffered input windows (see `_kernel`)
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(k_hbm.at[pl.ds(st, cap)], k_win.at[s],
                                      sems.at[s, 0]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(st, cap)], v_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 3]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    start = pl.multiple_of(starts_ref[i], 128)
    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()
    k_cur = k_win.at[slot]
    v_cur = v_win.at[slot]
    s_cur = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    mxs = []
    dens = []
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_cur[:, h * ch:(h + 1) * ch]
        # under bf16 compute the q/k/v windows arrive bf16: half the DMA
        # bytes and native-bf16 MXU contractions with f32 accumulation
        logits = jax.lax.dot_general(                     # [BN, cap] SDDMM
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = jnp.maximum(jnp.max(mat, axis=1, keepdims=True), _NEG)
        e = jnp.exp(mat - mx)
        e = jnp.where(member, e, 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        alpha = (e / denom) * s_cur[h, :][None, :]
        out_ref[:, h * ch:(h + 1) * ch] = jnp.dot(
            alpha.astype(v_cur.dtype), v_cur[:, h * ch:(h + 1) * ch],
            preferred_element_type=jnp.float32)
        mxs.append(mx)
        dens.append(denom)
    pad = jnp.zeros((bn, 128 - heads), jnp.float32)
    stats_ref[:, :] = jnp.concatenate([*mxs, pad, *dens, pad], axis=1)


def _attn_bwd_kernel(starts_ref, rp_lo_ref, rp_hi_ref,
                     k_hbm, v_hbm, scale_hbm,   # ANY
                     mask_hbm,                  # [1, E] pre-softmax mask ANY
                     q_ref, g_ref, stats_ref,   # [BN, ·] VMEM blocks
                     dk0_hbm, dv0_hbm,          # zero arenas aliased to outputs
                     dq_ref,                    # [BN, H] VMEM block output
                     dk_out, dv_out,            # [E, H] ANY outputs
                     k_win, v_win, s_win, m_win, dk_acc, dv_acc, sems,
                     *, bn: int, cap: int, heads: int, ch: int,
                     inv_sqrt_ch: float):
    """Backward: recomputes logits (SDDMM) and the softmax matrix from the
    forward stats, then per head runs U = g·vᵀ, dv = αᵀ·g, dq = DL·k/√c and
    dk = DLᵀ·q/√c as MXU contractions in the window. dq is a regular
    node-space block output; dk/dv accumulate via sequential RMW windows."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    start = pl.multiple_of(starts_ref[i], 128)

    def copies(idx, s):
        # double-buffered input windows (see `_kernel`)
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(k_hbm.at[pl.ds(st, cap)], k_win.at[s],
                                      sems.at[s, 0]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(st, cap)], v_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 5]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    # RMW accumulators stay serialized (previous block's writeback landed)
    cp_dk = pltpu.make_async_copy(dk_out.at[pl.ds(start, cap)], dk_acc,
                                  sems.at[0, 3])
    cp_dv = pltpu.make_async_copy(dv_out.at[pl.ds(start, cap)], dv_acc,
                                  sems.at[0, 4])
    cp_dk.start()
    cp_dv.start()

    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()
    cp_dk.wait()
    cp_dv.wait()
    k_curw = k_win.at[slot]
    v_curw = v_win.at[slot]
    s_curw = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    stats = stats_ref[:, :]
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_curw[:, h * ch:(h + 1) * ch]
        v_h = v_curw[:, h * ch:(h + 1) * ch]
        g_h = g_ref[:, h * ch:(h + 1) * ch]
        sc = s_curw[h, :][None, :]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = stats[:, h:h + 1]
        den = stats[:, 128 + h:129 + h]
        s_mat = jnp.where(mat > 0.5 * _NEG, jnp.exp(mat - mx), 0.0) / den
        a_mat = s_mat * sc
        u_mat = jax.lax.dot_general(
            g_h.astype(v_h.dtype), v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w_mat = sc * u_mat
        inner = jnp.sum(a_mat * u_mat, axis=1, keepdims=True)
        dl_mat = (s_mat * (w_mat - inner)).astype(k_h.dtype)  # [BN, cap]
        dq_ref[:, h * ch:(h + 1) * ch] = (jnp.dot(
            dl_mat, k_h, preferred_element_type=jnp.float32)
            * inv_sqrt_ch).astype(dq_ref.dtype)
        dk_h = jax.lax.dot_general(
            dl_mat, q_h.astype(k_h.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        dk_acc[:, h * ch:(h + 1) * ch] = (
            dk_acc[:, h * ch:(h + 1) * ch] + dk_h.astype(dk_acc.dtype))
        dv_h = jax.lax.dot_general(
            a_mat.astype(v_h.dtype), g_h.astype(v_h.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[:, h * ch:(h + 1) * ch] = (
            dv_acc[:, h * ch:(h + 1) * ch] + dv_h.astype(dv_acc.dtype))

    wb_k = pltpu.make_async_copy(dk_acc, dk_out.at[pl.ds(start, cap)],
                                 sems.at[0, 3])
    wb_v = pltpu.make_async_copy(dv_acc, dv_out.at[pl.ds(start, cap)],
                                 sems.at[0, 4])
    wb_k.start()
    wb_k.wait()
    wb_v.start()
    wb_v.wait()


def _attn_forward(q, k_e, v_e, scale_t, mask2, row_ptr, *, heads, block_n,
                  cap, interpret):
    e_total, hidden = v_e.shape
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec((block_n, 256), lambda i, s: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, cap, hidden), k_e.dtype),
            pltpu.VMEM((2, cap, hidden), v_e.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(_attn_kernel, bn=block_n, cap=cap, heads=heads,
                               ch=ch, inv_sqrt_ch=1.0 / (ch ** 0.5))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), k_e, v_e, scale_t, mask2, q)


def _attn_backward(q, k_e, v_e, scale_t, mask2, row_ptr, g, stats, *, heads,
                   block_n, cap, interpret):
    e_total, hidden = v_e.shape
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
            pl.BlockSpec((block_n, 256), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, cap, hidden), k_e.dtype),
            pltpu.VMEM((2, cap, hidden), v_e.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.VMEM((cap, hidden), k_e.dtype),
            pltpu.VMEM((cap, hidden), v_e.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    kernel = functools.partial(_attn_bwd_kernel, bn=block_n, cap=cap,
                               heads=heads, ch=ch,
                               inv_sqrt_ch=1.0 / (ch ** 0.5))
    dk0 = jnp.zeros((e_total, hidden), k_e.dtype)
    dv0 = jnp.zeros((e_total, hidden), v_e.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), q.dtype),
                   jax.ShapeDtypeStruct((e_total, hidden), k_e.dtype),
                   jax.ShapeDtypeStruct((e_total, hidden), v_e.dtype)),
        # flat inputs: starts, rp_lo, rp_hi, k, v, scale, mask, q, g, stats,
        # dk0, dv0
        input_output_aliases={10: 1, 11: 2},
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), k_e, v_e, scale_t, mask2, q,
      g.astype(jnp.float32), stats, dk0, dv0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def csr_attention(q, k_e, v_e, scale_t, mask2, row_ptr, dst, heads, block_n,
                  cap, interpret, max_in_degree, bwd_block_n, win64=0):
    """out_n = Σ_{e→n} softmax_e(q_n·k_e/√c)·scale_e·v_e over CSR segments,
    fully fused (no [E, heads] logits tensor in HBM, forward or backward).
    `mask2` [1, E] is the pre-softmax 0/1 validity mask (interior padding
    rows carry real dst values after dilution and must not contribute)."""
    return _attn_forward(q, k_e, v_e, scale_t, mask2, row_ptr, heads=heads,
                         block_n=block_n, cap=cap, interpret=interpret)[0]


def _attn_fwd(q, k_e, v_e, scale_t, mask2, row_ptr, dst, heads, block_n,
              cap, interpret, max_in_degree, bwd_block_n, win64=0):
    out, stats = _attn_forward(q, k_e, v_e, scale_t, mask2, row_ptr,
                               heads=heads, block_n=block_n, cap=cap,
                               interpret=interpret)
    return out, (q, k_e, v_e, scale_t, mask2, row_ptr, dst, stats)


def _attn_bwd(heads, block_n, cap, interpret, max_in_degree, bwd_block_n,
              win64, res, g):
    q, k_e, v_e, scale_t, mask2, row_ptr, dst, stats = res
    e_total, hidden = v_e.shape
    ch = hidden // heads

    if bwd_block_n is not None:
        cap_b = _win_cap(bwd_block_n, max_in_degree, e_total, win64)
        dq, dk, dv = _attn_backward(q, k_e, v_e, scale_t, mask2, row_ptr, g,
                                    stats, heads=heads, block_n=bwd_block_n,
                                    cap=cap_b, interpret=interpret)
        return (dq, dk, dv, None, None, None, None)

    # XLA edge-space fallback (backward VMEM budget unmet). With in-kernel
    # logits the dummy row's stats are self-consistent, so no masking is
    # needed: g rows for the dummy target are zero, which zeroes every
    # padded edge's contribution.
    mx = stats[:, :heads]
    denom = stats[:, 128:128 + heads]
    blocksum = jnp.asarray(np.repeat(np.eye(heads, dtype=np.float32), ch,
                                     axis=0))            # [H, heads]
    logits_e = ((q[dst] * k_e).astype(jnp.float32) @ blocksum) / (ch ** 0.5)
    scale_e = scale_t.T
    # select-before-multiply: all-masked segments carry mx = −1e30, so the
    # recomputed exp overflows to inf on their (masked) edges — a bare
    # `exp(·) * mask` would produce inf·0 = NaN there
    s_e = jnp.where(mask2[0][:, None] > 0,
                    jnp.exp(logits_e - mx[dst]) / denom[dst], 0.0)
    g_e = g.astype(jnp.float32)[dst]
    sm = s_e * scale_e
    dv = jnp.repeat(sm, ch, axis=1) * g_e
    u_e = (g_e * v_e.astype(jnp.float32)) @ blocksum
    w_e = scale_e * u_e
    sw = jnp.pad(s_e * w_e, ((0, 0), (0, 128 - heads)))
    inner = windowed_segment_sum(sw, row_ptr[:-1], e_total,
                                 max_deg=max_in_degree,
                                 interpret=interpret,
                                 win64=win64)[:, :heads]
    dl = s_e * (w_e - inner[dst])                        # [E, heads]
    dl_wide = jnp.repeat(dl, ch, axis=1) / (ch ** 0.5)   # [E, H]
    dk = dl_wide * q[dst]
    n = row_ptr.shape[0] - 1
    dq = jax.ops.segment_sum(dl_wide * k_e, dst, num_segments=n,
                             indices_are_sorted=True)
    return (dq.astype(q.dtype), dk.astype(k_e.dtype), dv.astype(v_e.dtype),
            None, None, None, None)


csr_attention.defvjp(_attn_fwd, _attn_bwd)


def pick_block_n_attn(n: int, e_total: int, max_in_degree: int, hidden: int,
                      preferred: int = 128, win64: int = 0):
    """Forward block size for csr_attention: double-buffered k/v windows
    plus ~4 live [bn, cap] softmax temporaries."""
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (4 * cap * hidden * 4 + 2 * 8 * cap * 4
                     + 2 * bn * max(hidden, 256) * 4 + 4 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def pick_block_n_attn_bwd(n: int, e_total: int, max_in_degree: int,
                          hidden: int, preferred: int = 128, win64: int = 0):
    """Backward block size: double-buffered k/v windows + dk/dv
    accumulators plus ~6 live [bn, cap] temporaries."""
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (6 * cap * hidden * 4 + 2 * 8 * cap * 4
                     + 4 * bn * max(hidden, 256) * 4 + 6 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def attn_fusable(n: int, e_total: int, max_in_degree: int,
                 hidden: int = 256, win64: int = 0) -> bool:
    return pick_block_n_attn(n, e_total, max_in_degree, hidden,
                             win64=win64) is not None


def fused_attention(q: jnp.ndarray, k_e: jnp.ndarray, v_e: jnp.ndarray,
                    row_ptr: jnp.ndarray, dst: jnp.ndarray, *, heads: int,
                    max_in_degree: int,
                    scale_t: Optional[jnp.ndarray] = None,
                    mask_e: Optional[jnp.ndarray] = None,
                    block_n: int = 128, win64: int = 0,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fully fused CSR attention over CSR-sorted edge arenas.

    `scale_t` is the [heads, E] post-softmax scale (attention dropout);
    defaults to ones. `mask_e` [E] is the pre-softmax validity mask —
    REQUIRED whenever the arena may contain interior padding rows
    (packer dilution forward-fills their dst with real targets); defaults
    to ones. The dummy row (n-1) owns tail padding and its output is
    unspecified, as in `fused_aggregate`."""
    n = row_ptr.shape[0] - 1
    e_total = v_e.shape[0]
    hidden = v_e.shape[1]
    bn = pick_block_n_attn(n, e_total, max_in_degree, hidden, block_n,
                           win64=win64)
    if bn is None:
        raise ValueError("fused_attention preconditions not met")
    cap = _win_cap(bn, max_in_degree, e_total, win64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale_t is None:
        scale_t = jnp.ones((heads, e_total), jnp.float32)
    mask2 = (jnp.ones((1, e_total), jnp.float32) if mask_e is None
             else mask_e.astype(jnp.float32).reshape(1, e_total))
    bwd_bn = pick_block_n_attn_bwd(n, e_total, max_in_degree, hidden,
                                   win64=win64)
    return csr_attention(q, k_e, v_e, scale_t, mask2, row_ptr, dst, heads,
                         bn, cap, interpret, max_in_degree, bwd_bn, win64)


# ---------------------------------------------------------------------------
# Fully fused CSR attention with in-kernel edge projection (eproj)
# ---------------------------------------------------------------------------
#
# One level deeper than `csr_attention`: the kernels consume the *gathered*
# source projections kv = (k‖v)[src] [E, 2H] and the RAW per-edge features
# ea [E, Fe] (angle embedding / projected bond states), with the conv's
# edge-projection weight W_e resident in VMEM, and compute
#     e = ea · W_e,   k = kv[:, :H] + e,   v = kv[:, H:] + e
# in-register per window. Consequences, per conv per step:
#   - no [E, H] `e` tensor in HBM (the external GEMM's read+write round trip)
#   - no [E, 2H] k_j/v_j materialization (the slice_add round trip)
#   - backward emits dkv [E, 2H] as ONE arena (no dk/dv → pad_add concat),
#     d_ea via de·W_eᵀ in-window, and dW_e as a VMEM-accumulated [Fe, H]
#     output (constant-index block, accumulated across the sequential grid)
# The only [E, ·] HBM tensors left per conv are the kv gather product and
# the ea arena itself (read-only, shared across layers for the line graph).


def _attn_ep_kernel(starts_ref, rp_lo_ref, rp_hi_ref,
                    kv_hbm, ea_hbm, scale_hbm,  # [E,2H], [E,Fe], [heads,E] ANY
                    mask_hbm,                   # [1, E] pre-softmax mask ANY
                    w_edge_ref,                 # [Fe, H] VMEM (resident)
                    q_ref,                      # [BN, H] VMEM block
                    out_ref, stats_ref,         # [BN, H], [BN, 256] blocks
                    kv_win, ea_win, s_win, m_win, sems,
                    *, bn: int, cap: int, heads: int, ch: int,
                    inv_sqrt_ch: float):
    """Forward: in-window edge projection + SDDMM + segment softmax +
    aggregation. Same window/membership/double-buffering structure as
    `_attn_kernel`; see there for the masking contract."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    hidden = heads * ch

    def copies(idx, s):
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(kv_hbm.at[pl.ds(st, cap)], kv_win.at[s],
                                      sems.at[s, 0]),
                pltpu.make_async_copy(ea_hbm.at[pl.ds(st, cap)], ea_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 3]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    start = pl.multiple_of(starts_ref[i], 128)
    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()
    kv_cur = kv_win.at[slot]
    ea_cur = ea_win.at[slot]
    s_cur = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    # e is cast to the window dtype before the adds so numerics match the
    # external-GEMM path exactly (XLA also rounds the f32-accumulated GEMM
    # output to the compute dtype before the k/v adds)
    e_mat = jnp.dot(ea_cur[:, :], w_edge_ref[:, :],
                    preferred_element_type=jnp.float32).astype(kv_win.dtype)
    k_full = kv_cur[:, :hidden] + e_mat                   # [cap, H]
    v_full = kv_cur[:, hidden:] + e_mat

    mxs = []
    dens = []
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_full[:, h * ch:(h + 1) * ch]
        logits = jax.lax.dot_general(                     # [BN, cap] SDDMM
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = jnp.maximum(jnp.max(mat, axis=1, keepdims=True), _NEG)
        e = jnp.exp(mat - mx)
        e = jnp.where(member, e, 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        alpha = (e / denom) * s_cur[h, :][None, :]
        out_ref[:, h * ch:(h + 1) * ch] = jnp.dot(
            alpha.astype(v_full.dtype), v_full[:, h * ch:(h + 1) * ch],
            preferred_element_type=jnp.float32)
        mxs.append(mx)
        dens.append(denom)
    pad = jnp.zeros((bn, 128 - heads), jnp.float32)
    stats_ref[:, :] = jnp.concatenate([*mxs, pad, *dens, pad], axis=1)


def _attn_ep_bwd_kernel(starts_ref, rp_lo_ref, rp_hi_ref,
                        kv_hbm, ea_hbm, scale_hbm,  # ANY
                        mask_hbm,                   # [1, E] ANY
                        w_edge_ref,                 # [Fe, H] VMEM (resident)
                        q_ref, g_ref, stats_ref,    # [BN, ·] VMEM blocks
                        dkv0_hbm, dea0_hbm,         # zero arenas (aliased)
                        dq_ref,                     # [BN, H] block output
                        dkv_out, dea_out,           # [E, 2H], [E, Fe] ANY
                        dw_ref,                     # [Fe, H] f32 block output
                                                    # (constant index map —
                                                    # accumulated over grid)
                        kv_win, ea_win, s_win, m_win, dkv_acc, dea_acc, sems,
                        *, bn: int, cap: int, heads: int, ch: int,
                        inv_sqrt_ch: float, e_total: int):
    """Backward: recompute e/k/v and the softmax from the forward stats,
    then per head the four MXU contractions (U = g·vᵀ, dv = αᵀ·g,
    dq = DL·k/√c, dk = DLᵀ·q/√c); de = dk + dv flows through W_e in-window
    (dea = de·W_eᵀ RMW-accumulated, dW_e += eaᵀ·de into the resident f32
    output block). Non-member rows carry zero dl/α, so overlapping RMW
    windows and the dW reduction stay exact."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    start = pl.multiple_of(starts_ref[i], 128)
    hidden = heads * ch

    def copies(idx, s):
        st = pl.multiple_of(starts_ref[idx], 128)
        return (pltpu.make_async_copy(kv_hbm.at[pl.ds(st, cap)], kv_win.at[s],
                                      sems.at[s, 0]),
                pltpu.make_async_copy(ea_hbm.at[pl.ds(st, cap)], ea_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 3]))

    @pl.when(i == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    # RMW accumulators stay serialized (previous block's writeback landed
    # before this body runs — TPU grids execute sequentially). Margin read:
    # an UNCLAMPED window starts at aligned_down(first member row), so
    # earlier blocks' real data can only occupy the first <128 rows of this
    # window — read just that margin and zero the rest in VMEM, cutting the
    # RMW read stream ~7×. A window clamped at the arena end
    # (start + cap ≥ e_total) can sit arbitrarily deep inside earlier
    # blocks' spans, so it falls back to the full-window read.
    margin_ok = cap > 128

    def rmw_reads(rows):
        return (pltpu.make_async_copy(dkv_out.at[pl.ds(start, rows)],
                                      dkv_acc.at[pl.ds(0, rows)],
                                      sems.at[0, 4]),
                pltpu.make_async_copy(dea_out.at[pl.ds(start, rows)],
                                      dea_acc.at[pl.ds(0, rows)],
                                      sems.at[0, 5]))

    def writebacks(st):
        return (pltpu.make_async_copy(dkv_acc, dkv_out.at[pl.ds(st, cap)],
                                      sems.at[1, 4]),
                pltpu.make_async_copy(dea_acc, dea_out.at[pl.ds(st, cap)],
                                      sems.at[1, 5]))

    # deferred-writeback: block i-1 left its dkv/dea writeback DMAs in
    # flight; drain them here, BEFORE this block's RMW read touches the
    # (overlapping) arenas or the (shared) accumulator buffers. The wb
    # overlaps block-boundary bookkeeping instead of serializing at the
    # end of every block; the last block drains its own wb inline.
    @pl.when(i > 0)
    def _():
        prev = pl.multiple_of(starts_ref[jnp.maximum(i - 1, 0)], 128)
        for cp in writebacks(prev):
            cp.wait()

    if not margin_ok:
        for cp in rmw_reads(cap):
            cp.start()
    else:
        full = start + cap >= e_total

        @pl.when(full)
        def _():
            for cp in rmw_reads(cap):
                cp.start()

        @pl.when(jnp.logical_not(full))
        def _():
            for cp in rmw_reads(128):
                cp.start()

    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()

    if not margin_ok:
        for cp in rmw_reads(cap):
            cp.wait()
    else:
        @pl.when(full)
        def _():
            for cp in rmw_reads(cap):
                cp.wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for cp in rmw_reads(128):
                cp.wait()
            dkv_acc[128:, :] = jnp.zeros((cap - 128, 2 * heads * ch),
                                         dkv_acc.dtype)
            dea_acc[128:, :] = jnp.zeros((cap - 128, dea_acc.shape[1]),
                                         dea_acc.dtype)
    kv_cur = kv_win.at[slot]
    ea_cur = ea_win.at[slot]
    s_curw = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    e_mat = jnp.dot(ea_cur[:, :], w_edge_ref[:, :],
                    preferred_element_type=jnp.float32).astype(kv_win.dtype)
    k_full = kv_cur[:, :hidden] + e_mat
    v_full = kv_cur[:, hidden:] + e_mat

    stats = stats_ref[:, :]
    de_cols = []
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_full[:, h * ch:(h + 1) * ch]
        v_h = v_full[:, h * ch:(h + 1) * ch]
        g_h = g_ref[:, h * ch:(h + 1) * ch]
        sc = s_curw[h, :][None, :]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = stats[:, h:h + 1]
        den = stats[:, 128 + h:129 + h]
        s_mat = jnp.where(mat > 0.5 * _NEG, jnp.exp(mat - mx), 0.0) / den
        a_mat = s_mat * sc
        u_mat = jax.lax.dot_general(
            g_h.astype(v_h.dtype), v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w_mat = sc * u_mat
        inner = jnp.sum(a_mat * u_mat, axis=1, keepdims=True)
        dl_mat = (s_mat * (w_mat - inner)).astype(k_h.dtype)  # [BN, cap]
        dq_ref[:, h * ch:(h + 1) * ch] = (jnp.dot(
            dl_mat, k_h, preferred_element_type=jnp.float32)
            * inv_sqrt_ch).astype(dq_ref.dtype)
        dk_h = jax.lax.dot_general(
            dl_mat, q_h.astype(k_h.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        dv_h = jax.lax.dot_general(
            a_mat.astype(v_h.dtype), g_h.astype(v_h.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dkv_acc[:, h * ch:(h + 1) * ch] = (
            dkv_acc[:, h * ch:(h + 1) * ch] + dk_h.astype(dkv_acc.dtype))
        dkv_acc[:, hidden + h * ch:hidden + (h + 1) * ch] = (
            dkv_acc[:, hidden + h * ch:hidden + (h + 1) * ch]
            + dv_h.astype(dkv_acc.dtype))
        de_cols.append((dk_h + dv_h).astype(kv_win.dtype))
    de = jnp.concatenate(de_cols, axis=1)                     # [cap, H]
    dea_acc[:, :] = dea_acc[:, :] + jax.lax.dot_general(
        de, w_edge_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dea_acc.dtype)
    dw_ref[:, :] = dw_ref[:, :] + jax.lax.dot_general(
        ea_cur[:, :], de, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    for cp in writebacks(start):
        cp.start()

    @pl.when(i == n_blocks - 1)
    def _():
        for cp in writebacks(start):
            cp.wait()


def _attn_ep_forward(q, kv, ea, w_edge, scale_t, mask2, row_ptr, *, heads,
                     block_n, cap, interpret):
    e_total = kv.shape[0]
    hidden = kv.shape[1] // 2
    fe = ea.shape[1]
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((fe, hidden), lambda i, s: (0, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec((block_n, 256), lambda i, s: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, cap, 2 * hidden), kv.dtype),
            pltpu.VMEM((2, cap, fe), ea.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(_attn_ep_kernel, bn=block_n, cap=cap,
                               heads=heads, ch=ch,
                               inv_sqrt_ch=1.0 / (ch ** 0.5))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), kv, ea, scale_t, mask2,
      w_edge, q)


def _attn_ep_backward(q, kv, ea, w_edge, scale_t, mask2, row_ptr, g, stats,
                      *, heads, block_n, cap, interpret):
    e_total = kv.shape[0]
    hidden = kv.shape[1] // 2
    fe = ea.shape[1]
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((fe, hidden), lambda i, s: (0, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
            pl.BlockSpec((block_n, 256), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec((fe, hidden), lambda i, s: (0, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, cap, 2 * hidden), kv.dtype),
            pltpu.VMEM((2, cap, fe), ea.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.VMEM((cap, 2 * hidden), kv.dtype),
            pltpu.VMEM((cap, fe), ea.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    kernel = functools.partial(_attn_ep_bwd_kernel, bn=block_n, cap=cap,
                               heads=heads, ch=ch,
                               inv_sqrt_ch=1.0 / (ch ** 0.5),
                               e_total=e_total)
    dkv0 = jnp.zeros((e_total, 2 * hidden), kv.dtype)
    dea0 = jnp.zeros((e_total, fe), ea.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # flat inputs: starts, rp_lo, rp_hi, kv, ea, scale, mask, w_edge, q,
        # g, stats, dkv0, dea0
        input_output_aliases={11: 1, 12: 2},
        out_shape=(jax.ShapeDtypeStruct((n, hidden), q.dtype),
                   jax.ShapeDtypeStruct((e_total, 2 * hidden), kv.dtype),
                   jax.ShapeDtypeStruct((e_total, fe), ea.dtype),
                   jax.ShapeDtypeStruct((fe, hidden), jnp.float32)),
        interpret=interpret,
    )(starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), kv, ea, scale_t, mask2,
      w_edge, q, g.astype(jnp.float32), stats, dkv0, dea0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def csr_attention_eproj(q, kv, ea, w_edge, scale_t, mask2, row_ptr, dst,
                        heads, block_n, cap, interpret, max_in_degree,
                        bwd_block_n, win64):
    """`csr_attention` with the edge projection fused in:
    out_n = Σ_{e→n} softmax_e(q_n·(kv0_e + ea_e·W)/√c)·scale_e·(kv1_e + ea_e·W)
    over CSR segments. Differentiable in q, kv [E, 2H], ea [E, Fe], w_edge."""
    return _attn_ep_forward(q, kv, ea, w_edge, scale_t, mask2, row_ptr,
                            heads=heads, block_n=block_n, cap=cap,
                            interpret=interpret)[0]


def _attn_ep_fwd(q, kv, ea, w_edge, scale_t, mask2, row_ptr, dst, heads,
                 block_n, cap, interpret, max_in_degree, bwd_block_n, win64):
    out, stats = _attn_ep_forward(q, kv, ea, w_edge, scale_t, mask2, row_ptr,
                                  heads=heads, block_n=block_n, cap=cap,
                                  interpret=interpret)
    return out, (q, kv, ea, w_edge, scale_t, mask2, row_ptr, dst, stats)


def _attn_ep_bwd(heads, block_n, cap, interpret, max_in_degree, bwd_block_n,
                 win64, res, g):
    q, kv, ea, w_edge, scale_t, mask2, row_ptr, dst, stats = res
    e_total = kv.shape[0]
    hidden = kv.shape[1] // 2
    ch = hidden // heads

    if bwd_block_n is not None:
        cap_b = _win_cap(bwd_block_n, max_in_degree, e_total, win64)
        dq, dkv, dea, dw = _attn_ep_backward(
            q, kv, ea, w_edge, scale_t, mask2, row_ptr, g, stats,
            heads=heads, block_n=bwd_block_n, cap=cap_b, interpret=interpret)
        return (dq, dkv, dea, dw.astype(w_edge.dtype), None, None, None, None)

    # XLA edge-space fallback (backward VMEM budget unmet)
    e_mat = (ea @ w_edge).astype(kv.dtype)
    k_e = kv[:, :hidden] + e_mat
    v_e = kv[:, hidden:] + e_mat
    mx = stats[:, :heads]
    denom = stats[:, 128:128 + heads]
    blocksum = jnp.asarray(np.repeat(np.eye(heads, dtype=np.float32), ch,
                                     axis=0))            # [H, heads]
    logits_e = ((q[dst] * k_e).astype(jnp.float32) @ blocksum) / (ch ** 0.5)
    scale_e = scale_t.T
    # select-before-multiply (see `_attn_bwd`): avoids inf·0 = NaN on the
    # masked edges of all-masked segments (stats carry mx = −1e30 there)
    s_e = jnp.where(mask2[0][:, None] > 0,
                    jnp.exp(logits_e - mx[dst]) / denom[dst], 0.0)
    g_e = g.astype(jnp.float32)[dst]
    sm = s_e * scale_e
    dv = jnp.repeat(sm, ch, axis=1) * g_e
    u_e = (g_e * v_e.astype(jnp.float32)) @ blocksum
    w_e = scale_e * u_e
    sw = jnp.pad(s_e * w_e, ((0, 0), (0, 128 - heads)))
    inner = windowed_segment_sum(sw, row_ptr[:-1], e_total,
                                 max_deg=max_in_degree,
                                 interpret=interpret,
                                 win64=win64)[:, :heads]
    dl = s_e * (w_e - inner[dst])                        # [E, heads]
    dl_wide = jnp.repeat(dl, ch, axis=1) / (ch ** 0.5)   # [E, H]
    dk = dl_wide * q[dst]
    n = row_ptr.shape[0] - 1
    dq = jax.ops.segment_sum(dl_wide * k_e, dst, num_segments=n,
                             indices_are_sorted=True)
    de = (dk + dv).astype(kv.dtype)
    dkv = jnp.concatenate([dk.astype(kv.dtype), dv.astype(kv.dtype)], axis=1)
    dea = (de @ w_edge.T).astype(ea.dtype)
    dw = jax.lax.dot_general(ea.astype(jnp.float32), de.astype(jnp.float32),
                             (((0,), (0,)), ((), ())))
    return (dq.astype(q.dtype), dkv, dea, dw.astype(w_edge.dtype),
            None, None, None, None)


csr_attention_eproj.defvjp(_attn_ep_fwd, _attn_ep_bwd)


def pick_block_n_attn_ep(n: int, e_total: int, max_in_degree: int,
                         hidden: int, fe: int, preferred: int = 128,
                         win64: int = 0, itemsize: int = 4):
    """Forward block size for csr_attention_eproj: double-buffered kv+ea
    windows (compute dtype) + the resident W_e + e/k/v live temporaries +
    ~4 live [bn, cap] softmax mats. Lane alignment (hidden/fe % 128) is the
    caller's gate — waived in interpret mode for test coverage."""
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (2 * (cap * (2 * hidden + fe) * itemsize + 9 * cap * 4)
                     + fe * hidden * itemsize
                     + cap * hidden * (4 + 3 * itemsize)
                     + 3 * bn * max(hidden, 256) * 4
                     + 4 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def pick_block_n_attn_ep_bwd(n: int, e_total: int, max_in_degree: int,
                             hidden: int, fe: int, preferred: int = 128,
                             win64: int = 0, itemsize: int = 4):
    """Backward block size: input windows + dkv/dea RMW accumulators + the
    resident W_e and f32 dW block + e/k/v/de temporaries + ~6 live
    [bn, cap] mats."""
    if e_total % 128:
        return None
    for bn in (128, 64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (2 * (cap * (2 * hidden + fe) * itemsize + 9 * cap * 4)
                     + cap * (2 * hidden + fe) * itemsize       # accumulators
                     + 2 * fe * hidden * (itemsize + 4)         # W_e + dW
                     + cap * hidden * (4 + 4 * itemsize)        # e/k/v/de
                     + cap * fe * 4                             # dea product
                     + 5 * bn * max(hidden, 256) * 4
                     + 6 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def attn_eproj_fusable(n: int, e_total: int, max_in_degree: int,
                       hidden: int = 256, fe: int = 256, win64: int = 0,
                       itemsize: int = 4) -> bool:
    return pick_block_n_attn_ep(n, e_total, max_in_degree, hidden, fe,
                                win64=win64, itemsize=itemsize) is not None


def fused_attention_eproj(q: jnp.ndarray, kv: jnp.ndarray, ea: jnp.ndarray,
                          w_edge: jnp.ndarray, row_ptr: jnp.ndarray,
                          dst: jnp.ndarray, *, heads: int,
                          max_in_degree: int,
                          scale_t: Optional[jnp.ndarray] = None,
                          mask_e: Optional[jnp.ndarray] = None,
                          block_n: int = 128, win64: int = 0,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fully fused CSR attention with the edge projection in-kernel.

    `kv` [E, 2H] is the gathered (k‖v)[src] arena (pre-edge-feature), `ea`
    [E, Fe] the raw per-edge features, `w_edge` [Fe, H] the conv's
    bias-free edge projection. Masking/dummy-row contract as in
    `fused_attention`."""
    n = row_ptr.shape[0] - 1
    e_total = kv.shape[0]
    hidden = kv.shape[1] // 2
    fe = ea.shape[1]
    itemsize = jnp.dtype(kv.dtype).itemsize
    bn = pick_block_n_attn_ep(n, e_total, max_in_degree, hidden, fe, block_n,
                              win64=win64, itemsize=itemsize)
    if bn is None:
        raise ValueError("fused_attention_eproj preconditions not met")
    cap = _win_cap(bn, max_in_degree, e_total, win64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale_t is None:
        scale_t = jnp.ones((heads, e_total), jnp.float32)
    mask2 = (jnp.ones((1, e_total), jnp.float32) if mask_e is None
             else mask_e.astype(jnp.float32).reshape(1, e_total))
    bwd_bn = pick_block_n_attn_ep_bwd(n, e_total, max_in_degree, hidden, fe,
                                      win64=win64, itemsize=itemsize)
    return csr_attention_eproj(q, kv, ea, w_edge, scale_t, mask2, row_ptr,
                               dst, heads, bn, cap, interpret, max_in_degree,
                               bwd_bn, win64)


# ---------------------------------------------------------------------------
# Windowed plain segment-sum (the gather-transpose kernel)
# ---------------------------------------------------------------------------

def _sum_kernel(starts_ref, rp_lo_ref, rp_hi_ref, vals_hbm, out_ref,
                win, sems, *, bn: int, cap: int, hidden: int):
    # double-buffered (see `_kernel`): compute slot i%2, prefetch i+1
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def copy(idx, s):
        st = pl.multiple_of(starts_ref[idx], 128)
        return pltpu.make_async_copy(vals_hbm.at[pl.ds(st, cap)], win.at[s],
                                     sems.at[s])

    @pl.when(i == 0)
    def _():
        copy(i, slot).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        copy(i + 1, 1 - slot).start()

    start = pl.multiple_of(starts_ref[i], 128)
    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    # 0/1 membership is exact in bf16, so the matmul dtype follows the
    # window (halved DMA under bf16 compute) with f32 accumulation
    member = ((pos >= lo[:, None]) & (pos < hi[:, None])).astype(win.dtype)
    copy(i, slot).wait()
    out_ref[:, :] = jnp.dot(member, win.at[slot][:, :],
                            preferred_element_type=jnp.float32)


def windowed_segment_sum(values: jnp.ndarray, seg_starts: jnp.ndarray,
                         e_total_end: int, *, max_deg: int,
                         block_n: int = 128, win64: int = 0,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Σ over contiguous CSR segments via windowed DMA + 0/1 matmul.

    `values` [E, H] must be segment-contiguous (sorted by target);
    `seg_starts` [N] are the per-segment start offsets (row_ptr[:-1]), the
    final segment ending at `e_total_end`. This is the MXU formulation of
    the gather transpose — the XLA alternative is a row-serial scatter-add.
    """
    e_total, hidden = values.shape
    n = seg_starts.shape[0]
    bn = pick_block_n(n, e_total, max_deg, hidden, block_n, win64=win64)
    if bn is None:
        raise ValueError("windowed_segment_sum preconditions not met")
    cap = _win_cap(bn, max_deg, e_total, win64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_blocks = n // bn
    rp_lo = seg_starts.reshape(n_blocks, bn)
    rp_hi = jnp.concatenate([seg_starts[1:],
                             jnp.asarray([e_total_end], seg_starts.dtype)]
                            ).reshape(n_blocks, bn)
    starts = jnp.minimum((rp_lo[:, 0] // 128) * 128,
                         jnp.maximum(e_total - cap, 0)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, bn), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, bn), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bn, hidden), lambda i, s: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, cap, hidden), values.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_sum_kernel, bn=bn, cap=cap, hidden=hidden)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, hidden), jnp.float32),
        interpret=interpret,
    )(starts, rp_lo, rp_hi, values)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def csr_gather(x, idx, seg_starts, max_deg, interpret, win64=0):
    """`x[idx]` for segment-contiguous `idx` (the arena's sort key); the VJP
    is a windowed segment-sum over the cotangent."""
    return x[idx]


def _csr_gather_fwd(x, idx, seg_starts, max_deg, interpret, win64=0):
    return x[idx], (idx.shape[0], seg_starts)


def _csr_gather_bwd(max_deg, interpret, win64, res, g):
    e_total, seg_starts = res
    dx = windowed_segment_sum(g, seg_starts, e_total,
                              max_deg=max_deg, interpret=interpret,
                              win64=win64)
    return dx.astype(g.dtype), None, None


csr_gather.defvjp(_csr_gather_fwd, _csr_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def csr_gather_ordered(x, idx, order, seg_starts, max_deg, interpret,
                       win64=0):
    """`x[idx]` for arbitrary `idx`, with `order` a permutation that sorts
    `idx` into contiguous segments (precomputed at pack time); the VJP
    permutes the cotangent then runs the windowed segment-sum. `win64`
    bounds the rows of any aligned 64-segment group of the sorted arena
    (packer-asserted) — it shrinks the VJP kernel's VMEM windows well below
    block·max_out_degree."""
    return x[idx]


def _csr_gather_ordered_fwd(x, idx, order, seg_starts, max_deg, interpret,
                            win64=0):
    return x[idx], (idx.shape[0], order, seg_starts)


def _csr_gather_ordered_bwd(max_deg, interpret, win64, res, g):
    e_total, order, seg_starts = res
    g_sorted = g[order]
    dx = windowed_segment_sum(g_sorted, seg_starts,
                              e_total, max_deg=max_deg, interpret=interpret,
                              win64=win64)
    return dx.astype(g.dtype), None, None, None


csr_gather_ordered.defvjp(_csr_gather_ordered_fwd, _csr_gather_ordered_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def csr_segment_sum(values, seg_starts, dst, e_total_end: int, max_deg: int,
                    interpret, win64: int = 0):
    """Differentiable Σ over contiguous CSR segments: MXU-windowed forward
    (`windowed_segment_sum`), pure-GATHER backward (the transpose of a
    segment-sum is a broadcast over the segment — `g[dst]` — so neither pass
    touches an XLA scatter). `values` [E, H] must be dst-sorted with `dst`
    [E] the per-row segment ids and `seg_starts` [N] = row_ptr[:-1];
    `max_deg` must dominate every real row's span. f32 output."""
    return windowed_segment_sum(values, seg_starts, e_total_end,
                                max_deg=max_deg, interpret=interpret,
                                win64=win64)


def _csr_segment_sum_fwd(values, seg_starts, dst, e_total_end, max_deg,
                         interpret, win64=0):
    out = windowed_segment_sum(values, seg_starts, e_total_end,
                               max_deg=max_deg, interpret=interpret,
                               win64=win64)
    # zero-size proto carries the primal dtype (residuals must be arrays)
    return out, (dst, jnp.zeros((0,), values.dtype))


def _csr_segment_sum_bwd(e_total_end, max_deg, interpret, win64, res, g):
    dst, proto = res
    return g[dst].astype(proto.dtype), None, None


csr_segment_sum.defvjp(_csr_segment_sum_fwd, _csr_segment_sum_bwd)


# ---------------------------------------------------------------------------
# Span formulation: node-space kv, in-kernel gather via one-hot MXU matmul
# ---------------------------------------------------------------------------
#
# The eproj formulation above still consumes a GATHERED edge-space kv arena
# [E, 2H]: XLA materializes kv[src] (one full [E, 2H] HBM write + read), the
# backward emits d(kv[src]) edge-space, and a permute + windowed segment-sum
# fold it back to node space — for the line-graph conv that family is ~45 %
# of the whole training step's HBM traffic (PERF.md round 5).
#
# The span formulation removes the edge-space kv entirely by exploiting how
# the packer lays out batches: graphs occupy CONTIGUOUS arena rows, and
# every edge's source lives in the same graph as its target. For a block of
# BN consecutive targets, all source rows therefore sit in one contiguous
# node-table span of at most SPAN rows (SPAN measured at pack time —
# `data.batching.measure_span64`; `span_lo[t]` lower-bounds target t's
# source range and is monotone over the arena). Each grid step:
#
#   - DMAs the node-space kv span [SPAN, 2H] (≤ a couple of graphs) instead
#     of a gathered [cap, 2H] edge window,
#   - builds the gather as a 0/1 one-hot matmul P[cap, SPAN] @ span — an
#     MXU contraction, exact in bf16 (each output row is 1.0 · source row),
#   - and in the backward scatters d(k_j)/d(v_j) straight into node space
#     with the transposed matmul Pᵀ @ dkv_edge, read-modify-write
#     accumulated over the (overlapping, monotone) spans.
#
# Nothing of size [E, 2H] exists in HBM in either pass; the backward's
# output IS the node-space d(kv) the old permute + segment-sum pipeline
# ended at. Everything else (edge projection, SDDMM, softmax, stats,
# dropout scales, dea/dW accumulation) is identical to the eproj kernels.

def _attn_sp_kernel(starts_ref, sp_starts_ref, rp_lo_ref, rp_hi_ref,
                    kvn_hbm,                    # [N, 2H] node-space (k‖v)
                    ea_hbm, scale_hbm,          # [E, Fe], [heads, E] ANY
                    mask_hbm, src_hbm,          # [1, E] f32, [1, E] i32 ANY
                    w_edge_ref,                 # [Fe, H] VMEM (resident)
                    q_ref,                      # [BN, H] VMEM block
                    out_ref, stats_ref,         # [BN, H], [BN, 256] blocks
                    kv_span, ea_win, s_win, m_win, src_win, sems,
                    *, bn: int, cap: int, span: int, heads: int, ch: int,
                    inv_sqrt_ch: float):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    hidden = heads * ch

    def copies(idx, s):
        st = pl.multiple_of(starts_ref[idx], 128)
        sp = pl.multiple_of(sp_starts_ref[idx], 128)
        return (pltpu.make_async_copy(kvn_hbm.at[pl.ds(sp, span)],
                                      kv_span.at[s], sems.at[s, 0]),
                pltpu.make_async_copy(ea_hbm.at[pl.ds(st, cap)], ea_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 3]),
                pltpu.make_async_copy(src_hbm.at[:, pl.ds(st, cap)],
                                      src_win.at[s], sems.at[s, 4]))

    @pl.when(i == 0)
    def _():
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    start = pl.multiple_of(starts_ref[i], 128)
    sp_st = pl.multiple_of(sp_starts_ref[i], 128)
    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()
    ea_cur = ea_win.at[slot]
    s_cur = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    # one-hot gather: P[r, s] = 1 iff window row r sources from span row s.
    # Rows whose source lies outside this block's span (alignment-margin
    # rows of neighboring blocks, padding) get an all-zero P row — they are
    # never members, so the zeros are inert. The matmul is exact: each
    # output row is a single 1.0 · (source row) product, f32-accumulated.
    src_loc = src_win.at[slot][0, :] - sp_st                  # [cap] i32
    sp_iota = jax.lax.broadcasted_iota(jnp.int32, (cap, span), 1)
    p_mat = (sp_iota == src_loc[:, None]).astype(kv_span.dtype)
    gprec = (jax.lax.Precision.HIGHEST if kv_span.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)
    kv_g = jnp.dot(p_mat, kv_span.at[slot][:, :], precision=gprec,
                   preferred_element_type=jnp.float32).astype(kv_span.dtype)

    e_mat = jnp.dot(ea_cur[:, :], w_edge_ref[:, :],
                    preferred_element_type=jnp.float32).astype(kv_span.dtype)
    k_full = kv_g[:, :hidden] + e_mat                         # [cap, H]
    v_full = kv_g[:, hidden:] + e_mat

    mxs = []
    dens = []
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_full[:, h * ch:(h + 1) * ch]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = jnp.maximum(jnp.max(mat, axis=1, keepdims=True), _NEG)
        e = jnp.exp(mat - mx)
        e = jnp.where(member, e, 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        alpha = (e / denom) * s_cur[h, :][None, :]
        out_ref[:, h * ch:(h + 1) * ch] = jnp.dot(
            alpha.astype(v_full.dtype), v_full[:, h * ch:(h + 1) * ch],
            preferred_element_type=jnp.float32)
        mxs.append(mx)
        dens.append(denom)
    pad = jnp.zeros((bn, 128 - heads), jnp.float32)
    stats_ref[:, :] = jnp.concatenate([*mxs, pad, *dens, pad], axis=1)


def _attn_sp_bwd_kernel(starts_ref, sp_starts_ref, rp_lo_ref, rp_hi_ref,
                        kvn_hbm, ea_hbm, scale_hbm,  # ANY
                        mask_hbm, src_hbm,           # [1, E] ANY
                        w_edge_ref,                  # [Fe, H] VMEM (resident)
                        q_ref, g_ref, stats_ref,     # [BN, ·] VMEM blocks
                        dkvn0_hbm, dea0_hbm,         # zero arenas (aliased)
                        dq_ref,                      # [BN, H] block output
                        dkvn_out, dea_out,           # [N, 2H], [E, Fe] ANY
                        dw_ref,                      # [Fe, H] f32 (resident)
                        kv_span, ea_win, s_win, m_win, src_win,
                        dkv_acc, dea_acc, sems,
                        *, bn: int, cap: int, span: int, heads: int, ch: int,
                        inv_sqrt_ch: float, e_total: int):
    """Backward: recompute the gather/eproj/softmax, then the per-head MXU
    contractions; d(kv) scatters into NODE space via Pᵀ with full-span RMW
    (spans of consecutive blocks overlap wherever they share a graph, so
    no margin shortcut applies — the previous block's deferred writeback is
    drained before this block's span read). dea/dW as in the eproj kernel."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    start = pl.multiple_of(starts_ref[i], 128)
    sp_st = pl.multiple_of(sp_starts_ref[i], 128)
    hidden = heads * ch

    def copies(idx, s):
        st = pl.multiple_of(starts_ref[idx], 128)
        sp = pl.multiple_of(sp_starts_ref[idx], 128)
        return (pltpu.make_async_copy(kvn_hbm.at[pl.ds(sp, span)],
                                      kv_span.at[s], sems.at[s, 0]),
                pltpu.make_async_copy(ea_hbm.at[pl.ds(st, cap)], ea_win.at[s],
                                      sems.at[s, 1]),
                pltpu.make_async_copy(scale_hbm.at[:, pl.ds(st, cap)],
                                      s_win.at[s], sems.at[s, 2]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(st, cap)],
                                      m_win.at[s], sems.at[s, 3]),
                pltpu.make_async_copy(src_hbm.at[:, pl.ds(st, cap)],
                                      src_win.at[s], sems.at[s, 4]))

    @pl.when(i == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        for cp in copies(i, slot):
            cp.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    margin_ok = cap > 128

    def dkv_read():
        return pltpu.make_async_copy(dkvn_out.at[pl.ds(sp_st, span)],
                                     dkv_acc, sems.at[0, 5])

    def dea_reads(rows):
        return (pltpu.make_async_copy(dea_out.at[pl.ds(start, rows)],
                                      dea_acc.at[pl.ds(0, rows)],
                                      sems.at[0, 6]),)

    def writebacks(st, sp):
        return (pltpu.make_async_copy(dkv_acc, dkvn_out.at[pl.ds(sp, span)],
                                      sems.at[1, 5]),
                pltpu.make_async_copy(dea_acc, dea_out.at[pl.ds(st, cap)],
                                      sems.at[1, 6]))

    # drain block i-1's deferred writebacks BEFORE this block's RMW reads
    # touch the overlapping arenas or the shared accumulators
    @pl.when(i > 0)
    def _():
        prev = jnp.maximum(i - 1, 0)
        for cp in writebacks(pl.multiple_of(starts_ref[prev], 128),
                             pl.multiple_of(sp_starts_ref[prev], 128)):
            cp.wait()

    dkv_read().start()
    if not margin_ok:
        for cp in dea_reads(cap):
            cp.start()
    else:
        full = start + cap >= e_total

        @pl.when(full)
        def _():
            for cp in dea_reads(cap):
                cp.start()

        @pl.when(jnp.logical_not(full))
        def _():
            for cp in dea_reads(128):
                cp.start()

    lo = rp_lo_ref[i, :] - start
    hi = rp_hi_ref[i, :] - start
    pos = jax.lax.broadcasted_iota(jnp.int32, (bn, cap), 1)
    member = (pos >= lo[:, None]) & (pos < hi[:, None])

    for cp in copies(i, slot):
        cp.wait()

    dkv_read().wait()
    if not margin_ok:
        for cp in dea_reads(cap):
            cp.wait()
    else:
        @pl.when(full)
        def _():
            for cp in dea_reads(cap):
                cp.wait()

        @pl.when(jnp.logical_not(full))
        def _():
            for cp in dea_reads(128):
                cp.wait()
            dea_acc[128:, :] = jnp.zeros((cap - 128, dea_acc.shape[1]),
                                         dea_acc.dtype)
    ea_cur = ea_win.at[slot]
    s_curw = s_win.at[slot]
    member = member & (m_win.at[slot][0, :][None, :] > 0)

    src_loc = src_win.at[slot][0, :] - sp_st
    sp_iota = jax.lax.broadcasted_iota(jnp.int32, (cap, span), 1)
    p_mat = (sp_iota == src_loc[:, None]).astype(kv_span.dtype)
    gprec = (jax.lax.Precision.HIGHEST if kv_span.dtype == jnp.float32
             else jax.lax.Precision.DEFAULT)
    kv_g = jnp.dot(p_mat, kv_span.at[slot][:, :], precision=gprec,
                   preferred_element_type=jnp.float32).astype(kv_span.dtype)

    e_mat = jnp.dot(ea_cur[:, :], w_edge_ref[:, :],
                    preferred_element_type=jnp.float32).astype(kv_span.dtype)
    k_full = kv_g[:, :hidden] + e_mat
    v_full = kv_g[:, hidden:] + e_mat

    stats = stats_ref[:, :]
    dk_cols = []
    dv_cols = []
    for h in range(heads):
        q_h = q_ref[:, h * ch:(h + 1) * ch]
        k_h = k_full[:, h * ch:(h + 1) * ch]
        v_h = v_full[:, h * ch:(h + 1) * ch]
        g_h = g_ref[:, h * ch:(h + 1) * ch]
        sc = s_curw[h, :][None, :]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        mat = jnp.where(member, logits, _NEG)
        mx = stats[:, h:h + 1]
        den = stats[:, 128 + h:129 + h]
        s_mat = jnp.where(mat > 0.5 * _NEG, jnp.exp(mat - mx), 0.0) / den
        a_mat = s_mat * sc
        u_mat = jax.lax.dot_general(
            g_h.astype(v_h.dtype), v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        w_mat = sc * u_mat
        inner = jnp.sum(a_mat * u_mat, axis=1, keepdims=True)
        dl_mat = (s_mat * (w_mat - inner)).astype(k_h.dtype)  # [BN, cap]
        dq_ref[:, h * ch:(h + 1) * ch] = (jnp.dot(
            dl_mat, k_h, preferred_element_type=jnp.float32)
            * inv_sqrt_ch).astype(dq_ref.dtype)
        dk_h = jax.lax.dot_general(
            dl_mat, q_h.astype(k_h.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt_ch
        dv_h = jax.lax.dot_general(
            a_mat.astype(v_h.dtype), g_h.astype(v_h.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_cols.append(dk_h)
        dv_cols.append(dv_h)
    # edge-space d(k_j)‖d(v_j), rounded to the wire dtype exactly where the
    # eproj formulation's edge-space dkv output rounded
    dkv_edge = jnp.concatenate(
        [*(c.astype(kv_span.dtype) for c in dk_cols),
         *(c.astype(kv_span.dtype) for c in dv_cols)], axis=1)  # [cap, 2H]
    # node-space scatter: Pᵀ @ dkv_edge, f32-accumulated, RMW into the span
    contrib = jax.lax.dot_general(
        p_mat, dkv_edge, (((0,), (0,)), ((), ())), precision=gprec,
        preferred_element_type=jnp.float32)                     # [span, 2H]
    dkv_acc[:, :] = (dkv_acc[:, :].astype(jnp.float32)
                     + contrib).astype(dkv_acc.dtype)
    de = jnp.concatenate(
        [(dk_cols[h] + dv_cols[h]).astype(kv_span.dtype)
         for h in range(heads)], axis=1)                        # [cap, H]
    dea_acc[:, :] = dea_acc[:, :] + jax.lax.dot_general(
        de, w_edge_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dea_acc.dtype)
    dw_ref[:, :] = dw_ref[:, :] + jax.lax.dot_general(
        ea_cur[:, :], de, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    for cp in writebacks(start, sp_st):
        cp.start()

    @pl.when(i == n_blocks - 1)
    def _():
        for cp in writebacks(start, sp_st):
            cp.wait()


def _span_starts(src_lo, block_n: int, span: int, n_src: int):
    """Per-block 128-aligned-down span starts, clamped to the node arena.

    `src_lo` [n] is monotone, so the block's first target carries the
    block-wide minimum; clamping to n_src − span only ever moves a start
    DOWN, which keeps covering the block's (≤ span wide) source range."""
    block_lo = src_lo[::block_n]
    return jnp.clip((block_lo // 128) * 128, 0,
                    max(n_src - span, 0)).astype(jnp.int32)


def _attn_sp_forward(q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo,
                     row_ptr, *, heads, block_n, cap, span, interpret):
    e_total = ea.shape[0]
    n_src = kvn.shape[0]
    hidden = kvn.shape[1] // 2
    fe = ea.shape[1]
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    sp_starts = _span_starts(src_lo, block_n, span, n_src)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s, t: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s, t: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((fe, hidden), lambda i, s, t: (0, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s, t: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s, t: (i, 0)),
                   pl.BlockSpec((block_n, 256), lambda i, s, t: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, span, 2 * hidden), kvn.dtype),
            pltpu.VMEM((2, cap, fe), ea.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    kernel = functools.partial(_attn_sp_kernel, bn=block_n, cap=cap,
                               span=span, heads=heads, ch=ch,
                               inv_sqrt_ch=1.0 / (ch ** 0.5))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
        interpret=interpret,
    )(starts, sp_starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), kvn, ea, scale_t, mask2,
      src2, w_edge, q)


def _attn_sp_backward(q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo,
                      row_ptr, g, stats, *, heads, block_n, cap, span,
                      interpret):
    e_total = ea.shape[0]
    n_src = kvn.shape[0]
    hidden = kvn.shape[1] // 2
    fe = ea.shape[1]
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // block_n
    starts = _window_starts(row_ptr, block_n, cap, e_total)
    sp_starts = _span_starts(src_lo, block_n, span, n_src)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, block_n), lambda i, s, t: (0, 0)),
            pl.BlockSpec((n_blocks, block_n), lambda i, s, t: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((fe, hidden), lambda i, s, t: (0, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s, t: (i, 0)),
            pl.BlockSpec((block_n, hidden), lambda i, s, t: (i, 0)),
            pl.BlockSpec((block_n, 256), lambda i, s, t: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(pl.BlockSpec((block_n, hidden), lambda i, s, t: (i, 0)),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec((fe, hidden), lambda i, s, t: (0, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, span, 2 * hidden), kvn.dtype),
            pltpu.VMEM((2, cap, fe), ea.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.int32),
            pltpu.VMEM((span, 2 * hidden), kvn.dtype),
            pltpu.VMEM((cap, fe), ea.dtype),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
    )
    kernel = functools.partial(_attn_sp_bwd_kernel, bn=block_n, cap=cap,
                               span=span, heads=heads, ch=ch,
                               inv_sqrt_ch=1.0 / (ch ** 0.5),
                               e_total=e_total)
    dkvn0 = jnp.zeros((n_src, 2 * hidden), kvn.dtype)
    dea0 = jnp.zeros((e_total, fe), ea.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # flat inputs: starts, sp_starts, rp_lo, rp_hi, kvn, ea, scale,
        # mask, src2, w_edge, q, g, stats, dkvn0, dea0
        input_output_aliases={13: 1, 14: 2},
        out_shape=(jax.ShapeDtypeStruct((n, hidden), q.dtype),
                   jax.ShapeDtypeStruct((n_src, 2 * hidden), kvn.dtype),
                   jax.ShapeDtypeStruct((e_total, fe), ea.dtype),
                   jax.ShapeDtypeStruct((fe, hidden), jnp.float32)),
        interpret=interpret,
    )(starts, sp_starts, row_ptr[:-1].reshape(n_blocks, block_n),
      row_ptr[1:].reshape(n_blocks, block_n), kvn, ea, scale_t, mask2,
      src2, w_edge, q, g.astype(jnp.float32), stats, dkvn0, dea0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def csr_attention_span(q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo,
                       row_ptr, heads, block_n, cap, span, interpret,
                       bwd_block_n):
    """`csr_attention_eproj` with the kv gather fused in: `kvn` [N, 2H] is
    the NODE-space (k‖v) table, `src2` [1, E] the per-edge source rows and
    `src_lo` [N] the monotone per-target span starts; the kernels gather
    per-window via a one-hot MXU matmul and the backward returns d(kvn) in
    node space. Differentiable in q, kvn, ea, w_edge."""
    return _attn_sp_forward(q, kvn, ea, w_edge, scale_t, mask2, src2,
                            src_lo, row_ptr, heads=heads, block_n=block_n,
                            cap=cap, span=span, interpret=interpret)[0]


def _attn_sp_fwd(q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo, row_ptr,
                 heads, block_n, cap, span, interpret, bwd_block_n):
    out, stats = _attn_sp_forward(q, kvn, ea, w_edge, scale_t, mask2, src2,
                                  src_lo, row_ptr, heads=heads,
                                  block_n=block_n, cap=cap, span=span,
                                  interpret=interpret)
    return out, (q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo, row_ptr,
                 stats)


def _attn_sp_bwd(heads, block_n, cap, span, interpret, bwd_block_n, res, g):
    (q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo, row_ptr, stats) = res
    # fwd and bwd share block_n (pick_block_n_attn_sp budgets for the
    # heavier backward), so the window cap carries over unchanged
    dq, dkvn, dea, dw = _attn_sp_backward(
        q, kvn, ea, w_edge, scale_t, mask2, src2, src_lo, row_ptr, g, stats,
        heads=heads, block_n=block_n, cap=cap, span=span,
        interpret=interpret)
    return (dq, dkvn, dea, dw.astype(w_edge.dtype),
            None, None, None, None, None)


csr_attention_span.defvjp(_attn_sp_fwd, _attn_sp_bwd)


def pick_block_n_attn_sp(n: int, n_src: int, e_total: int,
                         max_in_degree: int, hidden: int, fe: int,
                         span: int, preferred: int = 64,
                         win64: int = 0, itemsize: int = 4):
    """Block size for the span kernels (fwd & bwd share it): double-buffered
    kv spans + ea windows + the one-hot P matrix + gather/eproj temporaries
    + (bwd) the span/window RMW accumulators. Span measurement is per
    64-target group, so blocks never exceed 64."""
    if e_total % 128 or n_src % 128 or span % 128 or span > n_src:
        return None
    for bn in (64, 32, 16, 8):
        if bn > preferred or n % bn:
            continue
        cap = _win_cap(bn, max_in_degree, e_total, win64)
        win_bytes = (
            2 * (span * 2 * hidden * itemsize + cap * fe * itemsize
                 + 10 * cap * 4)
            + span * 2 * hidden * (itemsize + 4)       # bwd acc + contrib
            + cap * fe * itemsize                      # dea acc
            + 2 * fe * hidden * (itemsize + 4)         # W_e + dW
            + cap * span * itemsize                    # P
            + cap * hidden * (4 + 4 * itemsize)        # e/k/v/de
            + 5 * bn * max(hidden, 256) * 4
            + 6 * bn * cap * 4)
        if win_bytes <= _VMEM_BUDGET:
            return bn
    return None


def attn_span_fusable(n: int, n_src: int, e_total: int, max_in_degree: int,
                      hidden: int = 256, fe: int = 256, span: int = 0,
                      win64: int = 0, itemsize: int = 4) -> bool:
    if not span:
        return False
    return pick_block_n_attn_sp(n, n_src, e_total, max_in_degree, hidden,
                                fe, span, win64=win64,
                                itemsize=itemsize) is not None


def fused_attention_span(q: jnp.ndarray, kvn: jnp.ndarray, ea: jnp.ndarray,
                         w_edge: jnp.ndarray, row_ptr: jnp.ndarray,
                         src: jnp.ndarray, src_lo: jnp.ndarray, *,
                         heads: int, max_in_degree: int, span: int,
                         scale_t: Optional[jnp.ndarray] = None,
                         mask_e: Optional[jnp.ndarray] = None,
                         block_n: int = 64, win64: int = 0,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Span-formulation fused CSR attention (gather + eproj + SDDMM +
    softmax + aggregation in one kernel over NODE-space kv).

    `kvn` [N, 2H] is the conv's node-space (k‖v) table, `src` [E] the
    per-edge source rows (dst-sorted arena order), `src_lo` [N] the
    monotone per-target span starts (`data.batching.compute_span_lo`) and
    `span` the pack-time-measured static bound
    (`data.batching.measure_span64`). Masking/dummy-row contract as in
    `fused_attention_eproj`."""
    n = row_ptr.shape[0] - 1
    e_total = ea.shape[0]
    n_src = kvn.shape[0]
    hidden = kvn.shape[1] // 2
    fe = ea.shape[1]
    itemsize = jnp.dtype(kvn.dtype).itemsize
    bn = pick_block_n_attn_sp(n, n_src, e_total, max_in_degree, hidden, fe,
                              span, min(block_n, 64), win64=win64,
                              itemsize=itemsize)
    if bn is None:
        raise ValueError("fused_attention_span preconditions not met")
    cap = _win_cap(bn, max_in_degree, e_total, win64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale_t is None:
        scale_t = jnp.ones((heads, e_total), jnp.float32)
    mask2 = (jnp.ones((1, e_total), jnp.float32) if mask_e is None
             else mask_e.astype(jnp.float32).reshape(1, e_total))
    src2 = src.astype(jnp.int32).reshape(1, e_total)
    return csr_attention_span(q, kvn, ea, w_edge, scale_t, mask2, src2,
                              src_lo.astype(jnp.int32), row_ptr, heads, bn,
                              cap, span, interpret, bn)
