"""Dev: decompose the fwd eproj kernel's per-block time by stripping stages.

Variants share the exact I/O and window/DMA structure of _attn_ep_kernel;
each adds one stage. Timing deltas attribute the 2.6 us/block between DMA,
the eproj GEMM, SDDMM rectangles, softmax VPU passes, and aggregation.
Run on the chip; LG-conv flagship shapes.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnep_tpu.data.batching import measure_win64
from gnnep_tpu.ops.pallas.csr_attention import _win_cap, _window_starts
from gnnep_tpu.utils.synth import synthetic_batch

_NEG = -1e30


def make_kernel(stage: str, bn, cap, heads, ch):
    hidden = heads * ch

    def kern(starts_ref, rp_lo_ref, rp_hi_ref, kv_hbm, ea_hbm, scale_hbm,
             mask_hbm, w_edge_ref, q_ref, out_ref, stats_ref,
             kv_win, ea_win, s_win, m_win, sems):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def copies(idx, s):
            st = pl.multiple_of(starts_ref[idx], 128)
            return (pltpu.make_async_copy(kv_hbm.at[pl.ds(st, cap)],
                                          kv_win.at[s], sems.at[s, 0]),
                    pltpu.make_async_copy(ea_hbm.at[pl.ds(st, cap)],
                                          ea_win.at[s], sems.at[s, 1]),
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

        if stage == "dma":
            # touch the windows so nothing is DCE'd; no matmuls
            out_ref[:, :] = (kv_cur[:bn, :hidden]
                             + ea_cur[:bn, :]).astype(jnp.float32)
            stats_ref[:, :] = jnp.broadcast_to(
                jnp.sum(member, axis=1, keepdims=True).astype(jnp.float32),
                (bn, 256))
            return

        e_mat = jnp.dot(ea_cur[:, :], w_edge_ref[:, :],
                        preferred_element_type=jnp.float32
                        ).astype(kv_win.dtype)
        k_full = kv_cur[:, :hidden] + e_mat
        v_full = kv_cur[:, hidden:] + e_mat
        if stage == "eproj":
            out_ref[:, :] = (k_full[:bn] + v_full[:bn]).astype(jnp.float32)
            stats_ref[:, :] = jnp.broadcast_to(
                jnp.sum(member, axis=1, keepdims=True).astype(jnp.float32),
                (bn, 256))
            return

        mxs = []
        dens = []
        accs = []
        for h in range(heads):
            q_h = q_ref[:, h * ch:(h + 1) * ch]
            k_h = k_full[:, h * ch:(h + 1) * ch]
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / (ch ** 0.5)
            if stage == "sddmm":
                mxs.append(jnp.max(logits, axis=1, keepdims=True))
                dens.append(jnp.sum(logits, axis=1, keepdims=True))
                continue
            mat = jnp.where(member, logits, _NEG)
            mx = jnp.maximum(jnp.max(mat, axis=1, keepdims=True), _NEG)
            e = jnp.exp(mat - mx)
            e = jnp.where(member, e, 0.0)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
            alpha = (e / denom) * s_cur[h, :][None, :]
            mxs.append(mx)
            dens.append(denom)
            if stage == "softmax":
                accs.append(jnp.sum(alpha, axis=1, keepdims=True))
                continue
            out_ref[:, h * ch:(h + 1) * ch] = jnp.dot(
                alpha.astype(v_full.dtype), v_full[:, h * ch:(h + 1) * ch],
                preferred_element_type=jnp.float32)
        if stage in ("sddmm", "softmax"):
            out_ref[:, :] = jnp.broadcast_to(
                sum(mxs) + sum(dens) + (sum(accs) if accs else 0.0),
                (bn, hidden))
        pad = jnp.zeros((bn, 128 - heads), jnp.float32)
        stats_ref[:, :] = jnp.concatenate([*mxs, pad, *dens, pad], axis=1)

    return kern


def run_variant(stage, q, kv, ea, we, scale_t, mask2, row_ptr, heads, bn,
                cap, iters=30):
    e_total = kv.shape[0]
    hidden = kv.shape[1] // 2
    fe = ea.shape[1]
    n = row_ptr.shape[0] - 1
    ch = hidden // heads
    n_blocks = n // bn
    starts = _window_starts(row_ptr, bn, cap, e_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, bn), lambda i, s: (0, 0)),
            pl.BlockSpec((n_blocks, bn), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((fe, hidden), lambda i, s: (0, 0)),
            pl.BlockSpec((bn, hidden), lambda i, s: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((bn, hidden), lambda i, s: (i, 0)),
                   pl.BlockSpec((bn, 256), lambda i, s: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, cap, 2 * hidden), kv.dtype),
            pltpu.VMEM((2, cap, fe), ea.dtype),
            pltpu.VMEM((2, heads, cap), jnp.float32),
            pltpu.VMEM((2, 1, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kern = make_kernel(stage, bn, cap, heads, ch)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
    )(*a))
    args = (starts, row_ptr[:-1].reshape(n_blocks, bn),
            row_ptr[1:].reshape(n_blocks, bn), kv, ea, scale_t, mask2, we, q)
    o, s = fn(*args)
    float(np.asarray(jnp.sum(o)))   # scalar-readback sync (tunnel gotcha:
    best = 1e9                      # block_until_ready under-syncs here)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o, s = fn(*args)
        float(np.asarray(jnp.sum(o)))
        best = min(best, (time.perf_counter() - t0) / iters)
    per_block = best / n_blocks * 1e6
    print(f"{stage:8s}: {best * 1e3:7.3f} ms/call  {per_block:6.3f} us/block")
    return best


def main():
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)
    ep = batch.edge_src.shape[0]
    lp = batch.lg_src.shape[0]
    heads, hidden = 4, 256
    dt = jnp.bfloat16
    kv = jnp.asarray(rng.normal(size=(lp, 2 * hidden)), dt)
    q = jnp.asarray(rng.normal(size=(ep, hidden)), dt)
    ea = jnp.asarray(rng.normal(size=(lp, hidden)), dt)
    we = jnp.asarray(rng.normal(size=(hidden, hidden)) * 0.05, dt)
    scale_t = jnp.ones((heads, lp), jnp.float32)
    mask2 = jnp.asarray(batch.lg_mask).reshape(1, lp)
    row_ptr = jnp.asarray(batch.lg_row_ptr)
    win64 = ((measure_win64(np.asarray(batch.lg_dst), ep) + 31) // 32) * 32
    bn = 64
    cap = _win_cap(bn, batch.lg_in_edges.shape[1], lp, win64)
    print(f"LG shapes: n={ep} E={lp} bn={bn} cap={cap} win64={win64}")
    for stage in ("dma", "eproj", "sddmm", "softmax", "full"):
        run_variant(stage, q, kv, ea, we, scale_t, mask2, row_ptr, heads,
                    bn, cap)


if __name__ == "__main__":
    main()
