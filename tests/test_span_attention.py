"""Span-formulation attention kernels: parity + span-metadata invariants.

The span formulation (`ops/pallas/csr_attention.py` "Span formulation")
replaces the gathered edge-space kv arena with an in-kernel one-hot gather
from a contiguous node-table span. It is config-gated OFF by default — a
measured hardware negative at flagship shapes (PERF.md round 5: the one-hot
MXU gather's 2·cap·span·2H FLOPs cancel the eliminated XLA streams) — but
the kernels stay correct and available for span/cap regimes that favor
them, so parity is pinned here (interpret mode; hardware parity was
verified bitwise on the chip during the round-5 A/B).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnep_tpu.data.batching import (compute_span_lo, measure_span64,
                                     measure_win64)
from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn
from gnnep_tpu.ops.pallas.csr_attention import (fused_attention_eproj,
                                                fused_attention_span)
from gnnep_tpu.utils.synth import synthetic_batch


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    return synthetic_batch(rng, n_graphs=8, mean_atoms=6, degree=6)


def test_span_metadata_invariants(batch):
    g = batch.y.shape[0]
    n_lo, b_lo = compute_span_lo(np.asarray(batch.node_graph),
                                 np.asarray(batch.edge_dst),
                                 np.asarray(batch.edge_mask), g)
    # monotone (block starts index each block's first row)
    assert np.all(np.diff(n_lo) >= 0)
    assert np.all(np.diff(b_lo) >= 0)
    nsp, bsp = measure_span64(np.asarray(batch.node_graph),
                              np.asarray(batch.edge_dst),
                              np.asarray(batch.edge_mask), g)
    assert nsp % 128 == 0 and bsp % 128 == 0 and nsp > 0 and bsp > 0
    # every real atom-graph edge's source is covered by its target block's
    # clamped span window
    src = np.asarray(batch.edge_src)
    dst = np.asarray(batch.edge_dst)
    mask = np.asarray(batch.edge_mask) > 0
    n = np.asarray(batch.nodes).shape[0]
    span = min(nsp, n)
    for e in np.nonzero(mask)[0]:
        t = dst[e]
        blk_lo = int(n_lo[(t // 64) * 64])
        start = min((blk_lo // 128) * 128, max(n - span, 0))
        assert start <= src[e] < start + span, (e, t, src[e], start, span)
    # packer-filled fields match the standalone computation
    assert np.array_equal(np.asarray(batch.node_span_lo), n_lo)
    assert np.array_equal(np.asarray(batch.bond_span_lo), b_lo)


def test_kernel_parity_vs_eproj(batch):
    """fused_attention_span ≡ fused_attention_eproj given kv_e = kvn[src]
    (forward and all four gradients), LG-conv shapes, interpret mode."""
    rng = np.random.default_rng(0)
    ep = batch.edge_src.shape[0]
    lp = batch.lg_src.shape[0]
    h, heads = 64, 2
    kvn = jnp.asarray(rng.normal(size=(ep, 2 * h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(ep, h)).astype(np.float32))
    ea = jnp.asarray(rng.normal(size=(lp, h)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(h, h)).astype(np.float32) * 0.1)
    row_ptr = jnp.asarray(batch.lg_row_ptr)
    src = jnp.asarray(batch.lg_src)
    dst = jnp.asarray(batch.lg_dst)
    span_lo = jnp.asarray(batch.bond_span_lo)
    mask = jnp.asarray(batch.lg_mask)
    _, bsp = measure_span64(np.asarray(batch.node_graph),
                            np.asarray(batch.edge_dst),
                            np.asarray(batch.edge_mask), batch.y.shape[0])
    bsp = min(bsp, ep)
    deg = batch.lg_in_edges.shape[1]
    win64 = ((measure_win64(np.asarray(batch.lg_dst), ep) + 31) // 32) * 32
    kw = dict(heads=heads, max_in_degree=deg, mask_e=mask, win64=win64)

    def f_ep(q, kvn, ea, we):
        out = fused_attention_eproj(q, kvn[src], ea, we, row_ptr, dst, **kw)
        return jnp.sum(out[:ep - 1] ** 2)

    def f_sp(q, kvn, ea, we):
        out = fused_attention_span(q, kvn, ea, we, row_ptr, src, span_lo,
                                   span=bsp, **kw)
        return jnp.sum(out[:ep - 1] ** 2)

    l_ep, g_ep = jax.value_and_grad(f_ep, argnums=(0, 1, 2, 3))(q, kvn, ea, we)
    l_sp, g_sp = jax.value_and_grad(f_sp, argnums=(0, 1, 2, 3))(q, kvn, ea, we)
    assert np.isfinite(float(l_ep))
    np.testing.assert_allclose(float(l_ep), float(l_sp), rtol=1e-6)
    for name, a, b in zip(("dq", "dkvn", "dea", "dwe"), g_ep, g_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-5, err_msg=name)


def test_model_gradients_match_base_path(batch):
    """alignn_apply with attn_span=True reproduces the default fused path's
    loss and gradients (force_fused interpret kernels, both convs)."""
    nsp, bsp = measure_span64(np.asarray(batch.node_graph),
                              np.asarray(batch.edge_dst),
                              np.asarray(batch.edge_mask), batch.y.shape[0])
    base = AlignnConfig(
        node_dim=batch.nodes.shape[1], edge_dim=batch.edge_attr.shape[1],
        angle_dim=batch.lg_attr.shape[1],
        global_dim=batch.globals_.shape[1] + 230,
        hidden=32, layers=2, heads=2, dropout=0.0, conv_impl="fused",
        force_fused=True)
    cfg_sp = dataclasses.replace(base, attn_span=True, edge_span64=nsp,
                                 lg_span64=bsp)
    params = init_alignn(jax.random.PRNGKey(0), base)

    def loss(p, cfg):
        m, lv = alignn_apply(p, cfg, batch)
        return jnp.sum(m ** 2) + jnp.sum(lv ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, base)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_sp)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4)
