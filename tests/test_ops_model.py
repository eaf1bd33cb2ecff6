"""Numeric tests for the compute layer (L3): segment primitives, the graph
transformer conv against an independent numpy reference, and the ALIGNN model.

This is the per-layer parity harness SURVEY.md §7 step 3 calls for: the
pure-jnp conv is validated against loop-based numpy math, and (later) the
Pallas kernels are allclosed against the jnp path.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnep_tpu.data.batching import BatchBudget, BatchPacker
from gnnep_tpu.models.alignn import (AlignnConfig, alignn_apply, alignn_embed,
                                     config_from_params, init_alignn)
from gnnep_tpu.ops.graph_attention import init_transformer_conv, transformer_conv
from gnnep_tpu.ops.segment import segment_max, segment_mean, segment_softmax, segment_sum

from synthetic import make_store


class TestSegmentOps:
    def test_sum_mean_max(self, rng):
        data = rng.normal(size=(20, 4)).astype(np.float32)
        seg = rng.integers(0, 5, size=20)
        got = segment_sum(jnp.array(data), jnp.array(seg), 5)
        want = np.zeros((5, 4), np.float32)
        for i, s in enumerate(seg):
            want[s] += data[i]
        np.testing.assert_allclose(got, want, atol=1e-5)
        got_mean = segment_mean(jnp.array(data), jnp.array(seg), 5)
        counts = np.bincount(seg, minlength=5).clip(1)
        np.testing.assert_allclose(got_mean, want / counts[:, None], atol=1e-5)

    def test_softmax_matches_numpy(self, rng):
        logits = rng.normal(size=(30, 2)).astype(np.float32)
        seg = np.sort(rng.integers(0, 6, size=30))
        got = np.asarray(segment_softmax(jnp.array(logits), jnp.array(seg), 6))
        for s in range(6):
            m = seg == s
            if m.any():
                e = np.exp(logits[m] - logits[m].max(axis=0))
                np.testing.assert_allclose(got[m], e / e.sum(axis=0), rtol=1e-5)

    def test_softmax_mask_and_empty_segments(self):
        logits = jnp.array([[1.0], [2.0], [3.0]])
        seg = jnp.array([0, 0, 2])
        mask = jnp.array([1.0, 0.0, 1.0])
        got = np.asarray(segment_softmax(logits, seg, 4, mask=mask))
        np.testing.assert_allclose(got[:, 0], [1.0, 0.0, 1.0], atol=1e-6)
        # segment 1 empty, segment 3 empty → no NaNs anywhere
        assert np.isfinite(got).all()


def numpy_transformer_conv(p, x, src, dst, edge_attr, heads):
    """Independent loop-based reference of the β-gated UniMP conv."""
    n, hidden = x.shape[0], p.w_query.shape[1]
    ch = hidden // heads
    q = (x @ p.w_query + p.b_query).reshape(n, heads, ch)
    k = (x @ p.w_key + p.b_key).reshape(n, heads, ch)
    v = (x @ p.w_value + p.b_value).reshape(n, heads, ch)
    e = (edge_attr @ p.w_edge).reshape(-1, heads, ch)
    msg = np.zeros((n, heads, ch))
    for i in range(n):
        inc = np.nonzero(dst == i)[0]
        if inc.size == 0:
            continue
        for h in range(heads):
            logits = np.array([q[i, h] @ (k[src[j], h] + e[j, h]) for j in inc]) / math.sqrt(ch)
            a = np.exp(logits - logits.max())
            a = a / a.sum()
            msg[i, h] = sum(a[t] * (v[src[j], h] + e[j, h]) for t, j in enumerate(inc))
    msg = msg.reshape(n, hidden)
    r = x @ p.w_skip + p.b_skip
    gate = 1 / (1 + np.exp(-np.concatenate([r, msg, r - msg], axis=1) @ p.w_beta))
    return gate * r + (1 - gate) * msg


class TestTransformerConv:
    def setup_method(self):
        self.rng = np.random.default_rng(1)
        self.heads, self.hidden, self.n, self.e = 2, 8, 7, 18
        self.params = init_transformer_conv(jax.random.PRNGKey(0), self.hidden,
                                            self.hidden, self.hidden)
        self.x = self.rng.normal(size=(self.n, self.hidden)).astype(np.float32)
        self.src = self.rng.integers(0, self.n, self.e).astype(np.int32)
        self.dst = self.rng.integers(0, self.n, self.e).astype(np.int32)
        self.eattr = self.rng.normal(size=(self.e, self.hidden)).astype(np.float32)

    def test_matches_numpy_reference(self):
        got = transformer_conv(self.params, jnp.array(self.x), jnp.array(self.src),
                               jnp.array(self.dst), jnp.array(self.eattr),
                               heads=self.heads)
        p_np = jax.tree.map(np.asarray, self.params)
        want = numpy_transformer_conv(p_np, self.x, self.src, self.dst,
                                      self.eattr, self.heads)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    def test_edge_permutation_invariance(self):
        perm = self.rng.permutation(self.e)
        a = transformer_conv(self.params, jnp.array(self.x), jnp.array(self.src),
                             jnp.array(self.dst), jnp.array(self.eattr), heads=self.heads)
        b = transformer_conv(self.params, jnp.array(self.x), jnp.array(self.src[perm]),
                             jnp.array(self.dst[perm]), jnp.array(self.eattr[perm]),
                             heads=self.heads)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_padding_invariance(self):
        """Extra padded edges/nodes pointing at a dummy slot don't change real rows."""
        a = transformer_conv(self.params, jnp.array(self.x), jnp.array(self.src),
                             jnp.array(self.dst), jnp.array(self.eattr),
                             heads=self.heads,
                             edge_mask=jnp.ones(self.e))
        x_pad = np.concatenate([self.x, np.zeros((3, self.hidden), np.float32)])
        dummy = self.n + 2
        src_pad = np.concatenate([self.src, [dummy] * 5]).astype(np.int32)
        dst_pad = np.concatenate([self.dst, [dummy] * 5]).astype(np.int32)
        eattr_pad = np.concatenate([self.eattr, self.rng.normal(size=(5, self.hidden)).astype(np.float32)])
        mask = np.concatenate([np.ones(self.e), np.zeros(5)]).astype(np.float32)
        b = transformer_conv(self.params, jnp.array(x_pad), jnp.array(src_pad),
                             jnp.array(dst_pad), jnp.array(eattr_pad),
                             heads=self.heads, edge_mask=jnp.array(mask))
        np.testing.assert_allclose(np.asarray(b)[:self.n], np.asarray(a), rtol=1e-4, atol=1e-5)

    def test_isolated_node_gets_beta_gated_skip(self):
        # node with no incoming edges: msg = 0 → out = β·r
        dst = np.full(self.e, 0, dtype=np.int32)  # everything targets node 0
        out = transformer_conv(self.params, jnp.array(self.x), jnp.array(self.src),
                               jnp.array(dst), jnp.array(self.eattr), heads=self.heads)
        p = jax.tree.map(np.asarray, self.params)
        r = self.x @ p.w_skip + p.b_skip
        msg = np.zeros_like(r)
        gate = 1 / (1 + np.exp(-np.concatenate([r, msg, r - msg], 1) @ p.w_beta))
        np.testing.assert_allclose(np.asarray(out)[1:], (gate * r)[1:], rtol=1e-4, atol=1e-5)


def _batch_and_cfg(n_graphs=6, hidden=16, layers=2, heads=2, seed=0):
    store = make_store(n_graphs, seed=seed)
    budget = BatchBudget.plan(store, range(n_graphs), batch_size=n_graphs)
    batch = next(iter(BatchPacker(store, budget).pack(range(n_graphs))))
    cfg = AlignnConfig(node_dim=store.node_dim, edge_dim=store.edge_dim,
                       angle_dim=store.angle_dim, global_dim=store.global_scalar_dim + 230,
                       target_dim=2, hidden=hidden, layers=layers, heads=heads,
                       dropout=0.1)
    return store, batch, cfg


class TestAlignnModel:
    def test_forward_shapes_and_finite(self):
        _, batch, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        mean, logvar = alignn_apply(params, cfg, batch)
        assert mean.shape == (6, 2) and logvar.shape == (6, 2)
        assert np.isfinite(np.asarray(mean)).all() and np.isfinite(np.asarray(logvar)).all()

    def test_jit_and_embed(self):
        _, batch, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        f = jax.jit(lambda p, b: alignn_apply(p, cfg, b))
        m1, _ = f(params, batch)
        m2, _ = alignn_apply(params, cfg, batch)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
        z = alignn_embed(params, cfg, batch)
        assert z.shape == (6, cfg.hidden)

    def test_batch_composition_invariance(self):
        """Model output for a graph is independent of its batch neighbors —
        the masking/padding discipline in one property."""
        store, _, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(1), cfg)
        budget = BatchBudget.plan(store, range(6), batch_size=6)
        full = next(iter(BatchPacker(store, budget).pack(range(6))))
        mean_full, _ = alignn_apply(params, cfg, full)
        solo_budget = BatchBudget.plan(store, range(6), batch_size=1)
        for g in range(3):
            solo = next(iter(BatchPacker(store, solo_budget).pack([g])))
            mean_solo, _ = alignn_apply(params, cfg, solo)
            np.testing.assert_allclose(np.asarray(mean_solo)[0],
                                       np.asarray(mean_full)[g], rtol=1e-3, atol=1e-4)

    def test_dropout_reproducible_and_off_in_eval(self):
        _, batch, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        k = jax.random.PRNGKey(7)
        a, _ = alignn_apply(params, cfg, batch, train=True, rng=k)
        b, _ = alignn_apply(params, cfg, batch, train=True, rng=k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        c, _ = alignn_apply(params, cfg, batch, train=True, rng=jax.random.PRNGKey(8))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        d, _ = alignn_apply(params, cfg, batch)
        e, _ = alignn_apply(params, cfg, batch)
        np.testing.assert_allclose(np.asarray(d), np.asarray(e))

    def test_scan_layers_matches_unrolled(self):
        """lax.scan over stacked layer params ≡ the unrolled Python loop —
        forward, dropout streams (same per-layer split(rng, 5)), and grads."""
        import dataclasses as dc

        _, batch, cfg = _batch_and_cfg()
        cfg_s = dc.replace(cfg, scan_layers=True)
        cfg_u = dc.replace(cfg, scan_layers=False)
        assert cfg.layers > 1
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        k = jax.random.PRNGKey(7)
        ms, ls = alignn_apply(params, cfg_s, batch, train=True, rng=k)
        mu, lu = alignn_apply(params, cfg_u, batch, train=True, rng=k)
        np.testing.assert_allclose(np.asarray(ms), np.asarray(mu),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                                   rtol=1e-6, atol=1e-6)

        def loss(p, c):
            m, l = alignn_apply(p, c, batch, train=True, rng=k)
            return (m ** 2).sum() + (l ** 2).sum()

        gs = jax.grad(lambda p: loss(p, cfg_s))(params)
        gu = jax.grad(lambda p: loss(p, cfg_u))(params)
        for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_gradients_finite(self):
        _, batch, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(0), cfg)

        def loss(p):
            mean, logvar = alignn_apply(p, cfg, batch)
            return jnp.mean(mean ** 2) + jnp.mean(logvar ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    def test_config_from_params(self):
        _, batch, cfg = _batch_and_cfg()
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        got = config_from_params(params, edge_dim=cfg.edge_dim, angle_dim=cfg.angle_dim,
                                 global_dim=cfg.global_dim, heads=cfg.heads)
        assert got.hidden == cfg.hidden and got.layers == cfg.layers
        assert got.node_dim == cfg.node_dim and got.target_dim == 2
