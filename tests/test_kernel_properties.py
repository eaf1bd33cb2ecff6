"""Property-based fuzz of the fused eproj attention kernel (interpret mode).

`csr_attention_eproj` is the production forward/backward for every conv in
the flagship model; its hand-built VMEM windowing (aligned starts, win64
caps, margin RMW, clamped tails, pre-softmax interior masks) has boundary
conditions no fixed fixture sweeps. This fuzz drives random CSR problems —
degree skew, interior diluted (masked) rows, tight measured win64 bounds,
odd head/channel splits — through the kernel and checks value AND all four
cotangents against an independent pure-jnp segment-op reference (the same
math `ops.graph_attention.transformer_conv` uses, no kernel code shared).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st, assume, HealthCheck

from gnnep_tpu.data.batching import measure_win64
from gnnep_tpu.ops.pallas.csr_attention import (attn_eproj_fusable,
                                                fused_attention_eproj)


def _case(rng, n, heads, hidden, fe, cap_d, interior_pad):
    """Random CSR-sorted eproj problem. Returns arrays + row_ptr/dst/mask."""
    degs = rng.integers(0, cap_d, n)
    degs[-1] = 0                               # reserved dummy target
    rows = []                                  # (dst, mask)
    for i in range(n - 1):
        rows += [(i, 1.0)] * int(degs[i])
        if interior_pad and degs[i] and rng.random() < 0.3:
            # diluted interior padding: masked rows that CARRY a real dst
            # (the packer's dilution does exactly this; CSR membership
            # alone cannot exclude them — only the mask stream can)
            rows += [(i, 0.0)] * int(rng.integers(1, 3))
    e_real = len(rows)
    e_total = max(((e_real + 127) // 128) * 128, 128)
    rows += [(n - 1, 0.0)] * (e_total - e_real)
    dst = np.asarray([r[0] for r in rows], np.int32)
    mask = np.asarray([r[1] for r in rows], np.float32)
    q = rng.normal(size=(n, hidden)).astype(np.float32)
    kv = rng.normal(size=(e_total, 2 * hidden)).astype(np.float32)
    ea = rng.normal(size=(e_total, fe)).astype(np.float32)
    w = (rng.normal(size=(fe, hidden)) * 0.3).astype(np.float32)
    row_ptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)
    max_deg = int(np.bincount(dst[mask > 0], minlength=n).max()
                  ) if (mask > 0).any() else 1
    # the table width must dominate the ROW SPAN (incl. interior padding)
    span = int((row_ptr[1:] - row_ptr[:-1])[:-1].max(initial=1))
    return q, kv, ea, w, row_ptr, dst, mask, max(span, max_deg, 1)


def _ref_loss(q, kv, ea, w, dst, mask, scale, heads, cot):
    """Pure-jnp segment-op reference of the eproj attention + loss."""
    n = q.shape[0]
    hidden = q.shape[1]
    ch = hidden // heads
    e_total = dst.shape[0]
    e = ea @ w
    k = (kv[:, :hidden] + e).reshape(e_total, heads, ch)
    v = (kv[:, hidden:] + e).reshape(e_total, heads, ch)
    qd = q[dst].reshape(e_total, heads, ch)
    logits = (qd * k).sum(-1) / math.sqrt(ch)          # [E, heads]
    logits = jnp.where(mask[:, None] > 0, logits, -1e30)
    mx = jax.lax.stop_gradient(
        jax.ops.segment_max(logits, dst, n))
    mx = jnp.maximum(mx, -1e30)
    ex = jnp.where(mask[:, None] > 0, jnp.exp(logits - mx[dst]), 0.0)
    den = jnp.maximum(jax.ops.segment_sum(ex, dst, n), 1e-16)
    alpha = ex / den[dst] * scale.T                     # [E, heads]
    out = jax.ops.segment_sum((alpha[..., None] * v).reshape(e_total, hidden),
                              dst, n)
    return (out[:-1] * cot).sum()


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 10_000),
       n=st.sampled_from([16, 24, 32, 64]),
       heads=st.sampled_from([1, 2, 4]),
       ch=st.sampled_from([8, 16]),
       cap_d=st.sampled_from([4, 8, 14]),
       interior_pad=st.booleans(),
       tight_win=st.booleans(),
       with_scale=st.booleans())
def test_eproj_kernel_matches_segment_reference(seed, n, heads, ch, cap_d,
                                                interior_pad, tight_win,
                                                with_scale):
    hidden = heads * ch
    rng = np.random.default_rng(seed)
    q, kv, ea, w, rp, dst, mask, width = _case(rng, n, heads, hidden, 16,
                                               cap_d, interior_pad)
    assume((mask > 0).any())
    win64 = 0
    if tight_win:
        w64 = measure_win64(dst, n)
        assume(w64 > 0)
        win64 = ((w64 + 31) // 32) * 32
    assume(attn_eproj_fusable(n, dst.shape[0], width, hidden=hidden,
                              fe=16, win64=win64))
    scale = (np.ones((heads, dst.shape[0]), np.float32) if not with_scale
             else ((rng.random((heads, dst.shape[0])) > 0.25)
                   .astype(np.float32) / 0.75))
    cot = rng.normal(size=(n - 1, hidden)).astype(np.float32)

    def loss_kernel(qq, kkvv, eaa, ww):
        out = fused_attention_eproj(
            qq, kkvv, eaa, ww, jnp.asarray(rp), jnp.asarray(dst),
            heads=heads, max_in_degree=width, block_n=8, win64=win64,
            scale_t=jnp.asarray(scale), mask_e=jnp.asarray(mask),
            interpret=True)
        return (out[:-1] * cot).sum()

    def loss_ref(qq, kkvv, eaa, ww):
        return _ref_loss(qq, kkvv, eaa, ww, jnp.asarray(dst),
                         jnp.asarray(mask), jnp.asarray(scale), heads, cot)

    args = (jnp.asarray(q), jnp.asarray(kv), jnp.asarray(ea), jnp.asarray(w))
    va, ga = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    vb, gb = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-4, atol=1e-5)
    real = mask > 0
    # q rows: all real targets; kv/ea rows: only real edges are specified
    np.testing.assert_allclose(np.asarray(ga[0])[:-1], np.asarray(gb[0])[:-1],
                               rtol=3e-4, atol=3e-5)
    for a, b in zip(ga[1:3], gb[1:3]):
        np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                                   rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ga[3]), np.asarray(gb[3]),
                               rtol=3e-4, atol=3e-5)
