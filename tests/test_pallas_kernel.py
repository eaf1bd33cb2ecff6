"""Pallas fused CSR attention vs the dense-table reference (interpret mode on
CPU — the same kernel code path the TPU compiles)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnep_tpu.data.batching import build_incoming_table
from gnnep_tpu.ops.pallas.csr_attention import fusable, fused_aggregate


def _csr_case(rng, n=32, heads=2, hidden=16, avg_deg=5, cap_d=8):
    """Random CSR-sorted aggregation problem with a masked tail."""
    degs = rng.integers(1, cap_d - 1, n)
    degs[-1] = 0  # dummy row
    dst = np.repeat(np.arange(n, dtype=np.int32), degs)
    e_real = dst.shape[0]
    # arena must satisfy the kernel's window preconditions:
    # e_total % 128 == 0 and e_total >= cap = round_up(block·D + 128, 128)
    cap_needed = ((8 * cap_d + 128 + 127) // 128) * 128
    e_total = max((-(-(e_real + 16) // 128)) * 128, cap_needed)
    pad = e_total - e_real
    dst = np.concatenate([dst, np.full(pad, n - 1, np.int32)])
    mask = np.concatenate([np.ones(e_real, np.float32), np.zeros(pad, np.float32)])
    logits = rng.normal(size=(e_total, heads)).astype(np.float32)
    logits[mask == 0] = -1e30
    v = rng.normal(size=(e_total, hidden)).astype(np.float32)
    row_ptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)
    table, table_mask, pos = build_incoming_table(dst, mask, n, cap_d, e_total - 1)
    return logits, v, row_ptr, table, table_mask, pos, dst


def _reference(logits, v, table, table_mask, heads, scale=None):
    n, d = table.shape
    hidden = v.shape[1]
    lt = logits[table]
    lt = np.where(table_mask[..., None] > 0, lt, -1e30)
    lt = lt - lt.max(axis=1, keepdims=True)
    e = np.exp(lt) * table_mask[..., None]
    alpha = e / np.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    if scale is not None:
        alpha = alpha * scale[table]
    vt = v[table].reshape(n, d, heads, hidden // heads)
    return np.einsum("ndh,ndhc->nhc", alpha, vt).reshape(n, hidden)


class TestFusedAggregate:
    def test_forward_matches_reference(self, rng):
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)
        got = fused_aggregate(jnp.asarray(logits), jnp.asarray(v),
                              jnp.asarray(rp), jnp.asarray(tab),
                              jnp.asarray(tmask), jnp.asarray(pos),
                              dst=jnp.asarray(dst),
                              heads=2, max_in_degree=tab.shape[1],
                              block_n=8, interpret=True)
        want = _reference(logits, v, tab, tmask, heads=2)
        # dummy row (owns padded edges under CSR) is unspecified — skip it
        np.testing.assert_allclose(np.asarray(got)[:-1], want[:-1],
                                   rtol=1e-5, atol=1e-5)

    def test_forward_with_dropout_scale(self, rng):
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)
        scale = (rng.random((logits.shape[0], 2)) > 0.3).astype(np.float32) / 0.7
        got = fused_aggregate(jnp.asarray(logits), jnp.asarray(v),
                              jnp.asarray(rp), jnp.asarray(tab),
                              jnp.asarray(tmask), jnp.asarray(pos),
                              dst=jnp.asarray(dst),
                              heads=2, max_in_degree=tab.shape[1],
                              scale_e=jnp.asarray(scale),
                              block_n=8, interpret=True)
        want = _reference(logits, v, tab, tmask, heads=2, scale=scale)
        np.testing.assert_allclose(np.asarray(got)[:-1], want[:-1],
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_table_path(self, rng):
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)

        def loss_fused(l, vv):
            out = fused_aggregate(l, vv, jnp.asarray(rp), jnp.asarray(tab),
                                  jnp.asarray(tmask), jnp.asarray(pos),
                                  dst=jnp.asarray(dst),
                                  heads=2, max_in_degree=tab.shape[1],
                                  block_n=8, interpret=True)
            return (out ** 2).sum()

        def loss_ref(l, vv):
            lt = l[jnp.asarray(tab)]
            lt = jnp.where(jnp.asarray(tmask)[..., None] > 0, lt, -1e30)
            lt = lt - jax.lax.stop_gradient(lt.max(axis=1, keepdims=True))
            e = jnp.exp(lt) * jnp.asarray(tmask)[..., None]
            alpha = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
            vt = vv[jnp.asarray(tab)].reshape(tab.shape[0], tab.shape[1], 2, 8)
            out = jnp.einsum("ndh,ndhc->nhc", alpha, vt).reshape(tab.shape[0], 16)
            return (out ** 2).sum()

        g1 = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(logits), jnp.asarray(v))
        g2 = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(logits), jnp.asarray(v))
        # gradients only meaningful for real edges (padded logits are -1e30)
        real = dst < tab.shape[0] - 1
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                                       rtol=1e-4, atol=1e-5)

    def test_gradients_with_dropout_scale(self, rng):
        """Backward-kernel parity including the post-softmax scale path."""
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)
        scale = (rng.random((logits.shape[0], 2)) > 0.3).astype(np.float32) / 0.7

        def loss_fused(l, vv):
            out = fused_aggregate(l, vv, jnp.asarray(rp), jnp.asarray(tab),
                                  jnp.asarray(tmask), jnp.asarray(pos),
                                  dst=jnp.asarray(dst),
                                  heads=2, max_in_degree=tab.shape[1],
                                  scale_e=jnp.asarray(scale),
                                  block_n=8, interpret=True)
            return (out ** 2).sum()

        def loss_ref(l, vv):
            lt = l[jnp.asarray(tab)]
            lt = jnp.where(jnp.asarray(tmask)[..., None] > 0, lt, -1e30)
            lt = lt - jax.lax.stop_gradient(lt.max(axis=1, keepdims=True))
            e = jnp.exp(lt) * jnp.asarray(tmask)[..., None]
            alpha = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
            alpha = alpha * jnp.asarray(scale)[jnp.asarray(tab)]
            vt = vv[jnp.asarray(tab)].reshape(tab.shape[0], tab.shape[1], 2, 8)
            out = jnp.einsum("ndh,ndhc->nhc", alpha, vt).reshape(tab.shape[0], 16)
            return (out ** 2).sum()

        g1 = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(logits), jnp.asarray(v))
        g2 = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(logits), jnp.asarray(v))
        real = dst < tab.shape[0] - 1
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                                       rtol=1e-4, atol=1e-5)

    def test_backward_kernel_matches_xla_fallback(self, rng):
        """The fused backward kernel and the XLA edge-space fallback must
        produce identical (dlogits, dv)."""
        from gnnep_tpu.ops.pallas import csr_attention as mod
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)
        scale = (rng.random((logits.shape[0], 2)) > 0.2).astype(np.float32) / 0.8

        def loss(l, vv, use_kernel):
            # force/deny the kernel path via pick_block_n_bwd monkeypatching
            out = fused_aggregate(l, vv, jnp.asarray(rp), jnp.asarray(tab),
                                  jnp.asarray(tmask), jnp.asarray(pos),
                                  dst=jnp.asarray(dst),
                                  heads=2, max_in_degree=tab.shape[1],
                                  scale_e=jnp.asarray(scale),
                                  block_n=8, interpret=True)
            return (out * np.arange(out.shape[1])[None, :]).sum()

        orig = mod.pick_block_n_bwd
        try:
            g_kernel = jax.grad(loss, argnums=(0, 1))(
                jnp.asarray(logits), jnp.asarray(v), True)
            mod.pick_block_n_bwd = lambda *a, **k: None
            g_xla = jax.grad(loss, argnums=(0, 1))(
                jnp.asarray(logits), jnp.asarray(v), False)
        finally:
            mod.pick_block_n_bwd = orig
        real = dst < tab.shape[0] - 1
        for a, b in zip(g_kernel, g_xla):
            np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                                       rtol=1e-5, atol=1e-6)

    def test_win64_bound_matches_unbounded(self, rng):
        """A valid per-64-target window bound must not change results
        (forward or gradients) — only the window capacity."""
        from gnnep_tpu.data.batching import measure_win64
        logits, v, rp, tab, tmask, pos, dst = _csr_case(rng)
        w64 = measure_win64(dst, tab.shape[0], group=64)

        def loss(l, vv, win64):
            out = fused_aggregate(l, vv, jnp.asarray(rp), jnp.asarray(tab),
                                  jnp.asarray(tmask), jnp.asarray(pos),
                                  dst=jnp.asarray(dst),
                                  heads=2, max_in_degree=tab.shape[1],
                                  win64=win64, block_n=8, interpret=True)
            return (out ** 2).sum()

        g0 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(logits),
                                            jnp.asarray(v), 0)
        g1 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(logits),
                                            jnp.asarray(v), max(w64, 1))
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_fusable_predicate(self):
        assert fusable(256, 10240, 16, block_n=128)
        assert fusable(256, 128, 16, block_n=128)         # window clamps to E
        assert not fusable(250, 10240, 16, block_n=128)   # n not divisible
        assert not fusable(256, 10000, 16, block_n=128)   # E not 128-aligned
        # degree so large no block size fits VMEM
        assert not fusable(256, 1 << 20, 4096, block_n=128)

    @pytest.mark.parametrize("ladder", ["eproj", "attn", "logits"])
    def test_model_fused_vs_table(self, ladder):
        """End-to-end model parity: conv_impl='fused' vs 'table' at every
        rung of the fused-kernel ladder — eproj (in-kernel edge projection),
        csr_attention (kv+e boundary), and the external-logits aggregate."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_store
        from gnnep_tpu.data.batching import BatchBudget, BatchPacker
        from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn

        store = make_store(10, seed=12)
        budget = BatchBudget.plan(store, range(10), batch_size=10)
        # force 128-divisible arenas so the fused path activates
        import dataclasses as dc
        budget = dc.replace(budget,
                            n_nodes=128, n_edges=256, n_lg_edges=1024)
        batch = next(iter(BatchPacker(store, budget).pack(range(10))))
        base = dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                    angle_dim=store.angle_dim,
                    global_dim=store.global_scalar_dim + 230,
                    target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0)
        cfg_f = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                             attn_eproj=(ladder == "eproj"),
                             attn_fused=(ladder != "logits"))
        cfg_t = AlignnConfig(**base, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg_f)
        mf, lf = alignn_apply(params, cfg_f, batch)
        mt, lt = alignn_apply(params, cfg_t, batch)
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mt),
                                   rtol=1e-3, atol=1e-4)


class TestFusedAttention:
    """Fully fused CSR attention (q·k SDDMM in-kernel)."""

    def _case(self, rng, n=32, heads=2, hidden=16, cap_d=8):
        degs = rng.integers(1, cap_d - 1, n)
        degs[-1] = 0
        dst = np.repeat(np.arange(n, dtype=np.int32), degs)
        e_real = dst.shape[0]
        cap_needed = ((8 * cap_d + 128 + 127) // 128) * 128
        e_total = max((-(-(e_real + 16) // 128)) * 128, cap_needed)
        dst = np.concatenate([dst, np.full(e_total - e_real, n - 1, np.int32)])
        mask = (np.arange(e_total) < e_real).astype(np.float32)
        q = rng.normal(size=(n, hidden)).astype(np.float32)
        k = rng.normal(size=(e_total, hidden)).astype(np.float32)
        v = rng.normal(size=(e_total, hidden)).astype(np.float32)
        row_ptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)
        return q, k, v, row_ptr, dst, mask

    def _ref(self, q, k, v, dst, mask, heads, scale_t=None):
        n, hidden = q.shape
        ch = hidden // heads
        e_total = k.shape[0]
        out = np.zeros((n, hidden), np.float32)
        for t in range(n):
            idx = np.nonzero((dst == t) & (mask > 0))[0]
            if idx.size == 0:
                continue
            for h in range(heads):
                sl = slice(h * ch, (h + 1) * ch)
                lg = (k[idx, sl] @ q[t, sl]) / np.sqrt(ch)
                a = np.exp(lg - lg.max())
                a /= max(a.sum(), 1e-16)
                if scale_t is not None:
                    a = a * scale_t[h, idx]
                out[t, sl] = a @ v[idx, sl]
        return out

    def test_forward_matches_reference(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import fused_attention
        q, k, v, rp, dst, mask = self._case(rng)
        got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(rp), jnp.asarray(dst), heads=2,
                              max_in_degree=8, block_n=8, interpret=True)
        want = self._ref(q, k, v, dst, mask, heads=2)
        np.testing.assert_allclose(np.asarray(got)[:-1], want[:-1],
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_autodiff_reference(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import fused_attention
        q, k, v, rp, dst, mask = self._case(rng)
        scale = (rng.random((2, k.shape[0])) > 0.25).astype(np.float32) / 0.75
        tab_mask = jnp.asarray(mask)
        w = rng.normal(size=(32, 16)).astype(np.float32)

        def loss_fused(qq, kk, vv):
            out = fused_attention(qq, kk, vv, jnp.asarray(rp),
                                  jnp.asarray(dst), heads=2, max_in_degree=8,
                                  scale_t=jnp.asarray(scale), block_n=8,
                                  interpret=True)
            return (out * w).sum()

        def loss_ref(qq, kk, vv):
            ch = 8
            d = jnp.asarray(dst)
            lg = []
            for h in range(2):
                sl = slice(h * ch, (h + 1) * ch)
                lg.append(((qq[d, sl] * kk[:, sl]).sum(-1) / np.sqrt(ch)))
            logits = jnp.stack(lg, axis=1)
            logits = jnp.where(tab_mask[:, None] > 0, logits, -1e30)
            from gnnep_tpu.ops.segment import segment_softmax
            alpha = segment_softmax(logits, d, 32) * jnp.asarray(scale).T
            msg = jnp.concatenate(
                [jax.ops.segment_sum(
                    alpha[:, h:h+1] * vv[:, h*ch:(h+1)*ch], d, 32)
                 for h in range(2)], axis=1)
            return (msg * w).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        real_e = mask > 0
        np.testing.assert_allclose(np.asarray(gf[0])[:-1],
                                   np.asarray(gr[0])[:-1],
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(gf[1:], gr[1:]):
            np.testing.assert_allclose(np.asarray(a)[real_e],
                                       np.asarray(b)[real_e],
                                       rtol=1e-4, atol=1e-5)

    def test_bf16_windows_match_f32(self, rng):
        """bf16 q/k/v flow through the kernels (forward + fused backward +
        XLA fallback) with bf16-dtype windows/outputs and f32-accumulated
        math close to the f32 path."""
        from gnnep_tpu.ops.pallas import csr_attention as mod
        q, k, v, rp, dst, mask = self._case(rng)

        def loss(qq, kk, vv):
            out = mod.fused_attention(qq, kk, vv, jnp.asarray(rp),
                                      jnp.asarray(dst), heads=2,
                                      max_in_degree=8, block_n=8,
                                      interpret=True)
            return (out ** 2).sum(), out

        args32 = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        args16 = tuple(a.astype(jnp.bfloat16) for a in args32)
        (_, out32), g32 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(*args32)
        (_, out16), g16 = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(*args16)
        assert g16[0].dtype == jnp.bfloat16
        assert g16[1].dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out16)[:-1],
                                   np.asarray(out32)[:-1], rtol=0.05,
                                   atol=0.05)
        real_e = mask > 0
        scale_g = max(np.abs(np.asarray(g32[1])[real_e]).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(g16[1], np.float32)[real_e] / scale_g,
            np.asarray(g32[1])[real_e] / scale_g, atol=0.06)
        # XLA fallback path under bf16: dtypes must round-trip too
        orig = mod.pick_block_n_attn_bwd
        try:
            mod.pick_block_n_attn_bwd = lambda *a, **kw: None
            g_xla = jax.grad(lambda *a: loss(*a)[0], argnums=(0, 1, 2))(
                *args16)
        finally:
            mod.pick_block_n_attn_bwd = orig
        assert g_xla[2].dtype == jnp.bfloat16

    def test_backward_xla_fallback_matches_kernel(self, rng):
        from gnnep_tpu.ops.pallas import csr_attention as mod
        q, k, v, rp, dst, mask = self._case(rng)

        def loss(qq, kk, vv):
            out = mod.fused_attention(qq, kk, vv, jnp.asarray(rp),
                                      jnp.asarray(dst), heads=2,
                                      max_in_degree=8, block_n=8,
                                      interpret=True)
            return (out ** 2).sum()

        g_kern = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        orig = mod.pick_block_n_attn_bwd
        try:
            mod.pick_block_n_attn_bwd = lambda *a, **kw: None
            g_xla = jax.grad(loss, argnums=(0, 1, 2))(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        finally:
            mod.pick_block_n_attn_bwd = orig
        real_e = mask > 0
        np.testing.assert_allclose(np.asarray(g_kern[0])[:-1],
                                   np.asarray(g_xla[0])[:-1],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(g_kern[1:], g_xla[1:]):
            np.testing.assert_allclose(np.asarray(a)[real_e],
                                       np.asarray(b)[real_e],
                                       rtol=1e-5, atol=1e-6)


class TestFusedAttentionEproj:
    """csr_attention_eproj ≡ edge-projection GEMM + k/v adds + csr_attention,
    in value and in every cotangent (q, kv, ea, W_e)."""

    def _case(self, rng, n=32, heads=2, hidden=16, fe=16, cap_d=8):
        degs = rng.integers(1, cap_d - 1, n)
        degs[-1] = 0
        dst = np.repeat(np.arange(n, dtype=np.int32), degs)
        e_real = dst.shape[0]
        cap_needed = ((8 * cap_d + 128 + 127) // 128) * 128
        e_total = max((-(-(e_real + 16) // 128)) * 128, cap_needed)
        dst = np.concatenate([dst, np.full(e_total - e_real, n - 1, np.int32)])
        mask = (np.arange(e_total) < e_real).astype(np.float32)
        q = rng.normal(size=(n, hidden)).astype(np.float32)
        kv = rng.normal(size=(e_total, 2 * hidden)).astype(np.float32)
        ea = rng.normal(size=(e_total, fe)).astype(np.float32)
        w_edge = rng.normal(size=(fe, hidden)).astype(np.float32) * 0.3
        row_ptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)
        return q, kv, ea, w_edge, row_ptr, dst, mask

    def _losses(self, rp, dst, scale=None, mask_e=None):
        from gnnep_tpu.ops.pallas.csr_attention import (fused_attention,
                                                        fused_attention_eproj)
        kw = dict(heads=2, max_in_degree=8, block_n=8, interpret=True,
                  scale_t=None if scale is None else jnp.asarray(scale),
                  mask_e=None if mask_e is None else jnp.asarray(mask_e))

        def loss_ep(qq, kkvv, eaa, ww):
            out = fused_attention_eproj(qq, kkvv, eaa, ww, jnp.asarray(rp),
                                        jnp.asarray(dst), **kw)
            return (out ** 2).sum()

        def loss_ref(qq, kkvv, eaa, ww):
            h = qq.shape[1]
            e = (eaa @ ww).astype(kkvv.dtype)
            out = fused_attention(qq, kkvv[:, :h] + e, kkvv[:, h:] + e,
                                  jnp.asarray(rp), jnp.asarray(dst), **kw)
            return (out ** 2).sum()

        return loss_ep, loss_ref

    def _assert_grads_close(self, ga, gb, mask, **tol):
        real_e = mask > 0
        np.testing.assert_allclose(np.asarray(ga[0])[:-1],
                                   np.asarray(gb[0])[:-1], **tol)
        for a, b in zip(ga[1:3], gb[1:3]):
            np.testing.assert_allclose(np.asarray(a)[real_e],
                                       np.asarray(b)[real_e], **tol)
        np.testing.assert_allclose(np.asarray(ga[3]), np.asarray(gb[3]),
                                   **tol)

    def test_matches_composition(self, rng):
        q, kv, ea, w, rp, dst, mask = self._case(rng)
        scale = (rng.random((2, kv.shape[0])) > 0.25).astype(np.float32) / .75
        loss_ep, loss_ref = self._losses(rp, dst, scale=scale, mask_e=mask)
        args = (jnp.asarray(q), jnp.asarray(kv), jnp.asarray(ea),
                jnp.asarray(w))
        va, ga = jax.value_and_grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        vb, gb = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
        self._assert_grads_close(ga, gb, mask, rtol=2e-4, atol=2e-5)

    def test_xla_fallback_matches_kernel(self, rng):
        from gnnep_tpu.ops.pallas import csr_attention as mod
        q, kv, ea, w, rp, dst, mask = self._case(rng)
        loss_ep, _ = self._losses(rp, dst, mask_e=mask)
        args = (jnp.asarray(q), jnp.asarray(kv), jnp.asarray(ea),
                jnp.asarray(w))
        g_kern = jax.grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        orig = mod.pick_block_n_attn_ep_bwd
        try:
            mod.pick_block_n_attn_ep_bwd = lambda *a, **kw: None
            g_xla = jax.grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        finally:
            mod.pick_block_n_attn_ep_bwd = orig
        self._assert_grads_close(g_kern, g_xla, mask, rtol=1e-4, atol=1e-5)

    def test_margin_rmw_large_arena(self, rng):
        """Arena ≫ window cap: interior blocks take the margin RMW read
        (first-128-rows only + VMEM zeroing), the clamped tail block the
        full read — grads must still match the XLA fallback exactly."""
        from gnnep_tpu.ops.pallas import csr_attention as mod
        q, kv, ea, w, rp, dst, mask = self._case(rng, n=128)
        e_total = kv.shape[0]
        cap = mod._win_cap(8, 8, e_total)
        assert cap < e_total, "test setup: margin path not engaged"
        loss_ep, _ = self._losses(rp, dst, mask_e=mask)
        args = (jnp.asarray(q), jnp.asarray(kv), jnp.asarray(ea),
                jnp.asarray(w))
        g_kern = jax.grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        orig = mod.pick_block_n_attn_ep_bwd
        try:
            mod.pick_block_n_attn_ep_bwd = lambda *a, **kw: None
            g_xla = jax.grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        finally:
            mod.pick_block_n_attn_ep_bwd = orig
        # atol 1e-4: single-member segments have dl = s·(w − inner) ≡ 0 in
        # one summation order and ~1e-5 in another (see PERF.md on
        # near-zero logit grads) — not an RMW artifact
        self._assert_grads_close(g_kern, g_xla, mask, rtol=1e-4, atol=1e-4)

    def test_bf16_dtypes_roundtrip(self, rng):
        q, kv, ea, w, rp, dst, mask = self._case(rng)
        loss_ep, loss_ref = self._losses(rp, dst, mask_e=mask)
        args = tuple(jnp.asarray(a, jnp.bfloat16) for a in (q, kv, ea, w))
        ga = jax.grad(loss_ep, argnums=(0, 1, 2, 3))(*args)
        gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        assert all(g.dtype == jnp.bfloat16 for g in ga)
        for a, b in zip(ga, gb):
            sc = max(np.abs(np.asarray(b, np.float32)).max(), 1.0)
            np.testing.assert_allclose(np.asarray(a, np.float32) / sc,
                                       np.asarray(b, np.float32) / sc,
                                       atol=0.08)


class TestWindowedSegmentSum:
    def test_matches_numpy(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import windowed_segment_sum
        n, h = 32, 16
        degs = rng.integers(0, 6, n)
        seg = np.repeat(np.arange(n), degs)
        e_real = seg.shape[0]
        e_total = max(-(-(e_real + 8) // 128) * 128, 256)
        vals = rng.normal(size=(e_total, h)).astype(np.float32)
        vals[e_real:] = 0.0  # padded cotangents are zero by construction
        seg_starts = np.searchsorted(seg, np.arange(n)).astype(np.int32)
        got = windowed_segment_sum(jnp.asarray(vals), jnp.asarray(seg_starts),
                                   e_total, max_deg=8, block_n=8,
                                   interpret=True)
        want = np.zeros((n, h), np.float32)
        for e in range(e_real):
            want[seg[e]] += vals[e]
        # dummy/tail row unspecified; compare the rest
        np.testing.assert_allclose(np.asarray(got)[:-1], want[:-1],
                                   rtol=1e-5, atol=1e-5)

    def test_csr_gather_grads(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import (csr_gather,
                                                        csr_gather_ordered)
        n, h = 32, 16
        degs = rng.integers(0, 6, n - 1)
        dst = np.sort(np.concatenate([np.repeat(np.arange(n - 1), degs)]))
        e_real = dst.shape[0]
        e_total = 256
        dst = np.concatenate([dst, np.full(e_total - e_real, n - 1)]).astype(np.int32)
        x = rng.normal(size=(n, h)).astype(np.float32)
        starts = np.searchsorted(dst, np.arange(n)).astype(np.int32)
        w = rng.normal(size=(e_total, h)).astype(np.float32)
        w[e_real:] = 0.0

        def loss_fused(xx):
            return (csr_gather(xx, jnp.asarray(dst), jnp.asarray(starts),
                               8, True) * w).sum()

        def loss_ref(xx):
            return (xx[jnp.asarray(dst)] * w).sum()

        g1 = np.asarray(jax.grad(loss_fused)(jnp.asarray(x)))
        g2 = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
        np.testing.assert_allclose(g1[:-1], g2[:-1], rtol=1e-4, atol=1e-5)

        # unsorted index set with precomputed order
        idx = rng.integers(0, n - 1, e_total).astype(np.int32)
        idx[e_real:] = n - 1
        order = np.argsort(idx, kind="stable").astype(np.int32)
        starts2 = np.searchsorted(idx[order], np.arange(n)).astype(np.int32)

        def loss_ord(xx):
            return (csr_gather_ordered(xx, jnp.asarray(idx), jnp.asarray(order),
                                       jnp.asarray(starts2), 48, True) * w).sum()

        def loss_ord_ref(xx):
            return (xx[jnp.asarray(idx)] * w).sum()

        g3 = np.asarray(jax.grad(loss_ord)(jnp.asarray(x)))
        g4 = np.asarray(jax.grad(loss_ord_ref)(jnp.asarray(x)))
        np.testing.assert_allclose(g3[:-1], g4[:-1], rtol=1e-4, atol=1e-5)

        # src-side win64 bound: same grads with the measured group bound
        from gnnep_tpu.data.batching import measure_seg_win64
        b64 = measure_seg_win64(starts2, e_total)
        assert b64 < e_total  # bound actually shrinks the window

        def loss_ord_b(xx):
            return (csr_gather_ordered(xx, jnp.asarray(idx), jnp.asarray(order),
                                       jnp.asarray(starts2), 48, True,
                                       b64) * w).sum()

        g5 = np.asarray(jax.grad(loss_ord_b)(jnp.asarray(x)))
        np.testing.assert_allclose(g5[:-1], g4[:-1], rtol=1e-4, atol=1e-5)

    def test_model_grad_parity_fused_gathers(self):
        """Full-model gradient parity: fused (kernel + CSR-gather VJPs) vs
        the plain table path — with the fully fused attention boundary
        active so the csr_attention kernels get model-level coverage."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_store
        from gnnep_tpu.data.batching import BatchBudget, BatchPacker
        from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn
        import dataclasses as dc

        store = make_store(10, seed=12)
        budget = dc.replace(BatchBudget.plan(store, range(10), batch_size=10),
                            n_nodes=128, n_edges=256, n_lg_edges=1024)
        batch = next(iter(BatchPacker(store, budget).pack(range(10))))
        base = dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                    angle_dim=store.angle_dim,
                    global_dim=store.global_scalar_dim + 230,
                    target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0)
        cfg_f = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                             attn_fused=True)
        cfg_t = AlignnConfig(**base, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg_f)

        def loss(p, cfg):
            m, l = alignn_apply(p, cfg, batch)
            return (m ** 2).sum() + (l ** 2).sum()

        gf = jax.grad(lambda p: loss(p, cfg_f))(params)
        gt = jax.grad(lambda p: loss(p, cfg_t))(params)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)

    def test_attn_fused_on_diluted_batch(self):
        """Interior padding rows (dilution relocates padding bonds into real
        atoms' CSR segments with forward-filled dst) must NOT contribute to
        the in-kernel-softmax attention path: the kernels take an explicit
        pre-softmax edge-mask stream, since CSR membership alone cannot
        exclude them. Regression: attn-fused ≡ table on a diluted batch."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_store
        from gnnep_tpu.data.batching import (BatchBudget, BatchPacker,
                                             measure_win64)
        from gnnep_tpu.models.alignn import (AlignnConfig, alignn_apply,
                                             init_alignn)
        import dataclasses as dc

        store = make_store(10, seed=7)
        budget = dc.replace(BatchBudget.plan(store, range(10), batch_size=10),
                            n_nodes=128, n_edges=256, n_lg_edges=1024,
                            # tight bounds force dilution to interleave
                            # padding bonds into real atom segments
                            edge_win64=96, lg_win64=160)
        batch = next(iter(BatchPacker(store, budget).pack(range(10))))
        em = np.asarray(batch.edge_mask)
        # dilution actually produced interior padding (masked row whose dst
        # is a real atom, before the tail)
        interior = (em == 0) & (np.asarray(batch.edge_dst)
                                < batch.nodes.shape[0] - 1)
        assert interior.any(), "test setup: no interior padding produced"
        assert measure_win64(np.asarray(batch.edge_dst),
                             batch.nodes.shape[0]) <= 96
        base = dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                    angle_dim=store.angle_dim,
                    global_dim=store.global_scalar_dim + 230,
                    target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0,
                    edge_win64=96, lg_win64=160)
        cfg_f = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                             attn_fused=True)
        cfg_t = AlignnConfig(**base, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg_f)
        mf, lf = alignn_apply(params, cfg_f, batch)
        mt, lt = alignn_apply(params, cfg_t, batch)
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mt),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lt),
                                   rtol=5e-4, atol=5e-5)

        def loss(p, cfg):
            m, l = alignn_apply(p, cfg, batch)
            return (m ** 2).sum() + (l ** 2).sum()

        gf = jax.grad(lambda p: loss(p, cfg_f))(params)
        gt = jax.grad(lambda p: loss(p, cfg_t))(params)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)


class TestCsrSegmentSum:
    """Differentiable windowed segment-sum wrapper (edge-sharded fast path):
    MXU-windowed forward == jax.ops.segment_sum, backward == pure gather."""

    def _csr(self, rng, n=256, max_deg=6, h=128):
        counts = rng.integers(0, max_deg + 1, n)
        counts[-1] = 0
        dst = np.repeat(np.arange(n, dtype=np.int32), counts)
        e_total = ((dst.size + 127) // 128 + 1) * 128
        dst = np.concatenate([dst, np.full(e_total - dst.size, n - 1,
                                           np.int32)])
        starts = np.searchsorted(dst, np.arange(n)).astype(np.int32)
        vals = rng.normal(size=(e_total, h)).astype(np.float32)
        return vals, starts, dst, e_total

    def test_forward_matches_segment_sum(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import csr_segment_sum

        vals, starts, dst, e_total = self._csr(rng)
        got = np.asarray(csr_segment_sum(vals, starts, dst, e_total, 8, True))
        want = np.asarray(jax.ops.segment_sum(vals, dst, 256))
        # dummy row (255) owns the tail padding; its window under-covers by
        # contract — compare real rows only
        np.testing.assert_allclose(got[:255], want[:255], rtol=1e-5,
                                   atol=1e-5)

    def test_backward_is_gather(self, rng):
        from gnnep_tpu.ops.pallas.csr_attention import csr_segment_sum

        vals, starts, dst, e_total = self._csr(rng)
        w = rng.normal(size=(256, 128)).astype(np.float32)
        # dummy-row contract: zero cotangent on the dummy row (as in the
        # model, where its output never reaches the loss)
        w[255] = 0.0

        def loss(v):
            out = csr_segment_sum(v, starts, dst, e_total, 8, True)
            return jnp.sum(out * w)

        g = np.asarray(jax.grad(loss)(jnp.asarray(vals)))
        np.testing.assert_allclose(g, w[dst], rtol=1e-6, atol=1e-6)

    def test_win64_bound_matches_unbounded(self, rng):
        from gnnep_tpu.data.batching import measure_win64
        from gnnep_tpu.ops.pallas.csr_attention import csr_segment_sum

        vals, starts, dst, e_total = self._csr(rng)
        w64 = measure_win64(dst, 256)
        a = np.asarray(csr_segment_sum(vals, starts, dst, e_total, 8, True))
        b = np.asarray(csr_segment_sum(vals, starts, dst, e_total, 8, True,
                                       w64))
        np.testing.assert_allclose(a[:255], b[:255], rtol=1e-6, atol=1e-6)
