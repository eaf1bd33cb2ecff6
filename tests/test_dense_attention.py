"""Dense padded-adjacency conv (TPU fast path) vs COO segment-op path:
values and gradients must agree to float tolerance."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.data.batching import BatchBudget, BatchPacker, build_incoming_table
from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn
from gnnep_tpu.ops.dense_attention import transformer_conv_table
from gnnep_tpu.ops.graph_attention import init_transformer_conv, transformer_conv

from synthetic import make_store


class TestTableConv:
    def setup_method(self):
        rng = np.random.default_rng(2)
        self.n, self.e, self.h, self.heads = 12, 40, 16, 2
        self.x = rng.normal(size=(self.n, self.h)).astype(np.float32)
        self.src = rng.integers(0, self.n - 1, self.e).astype(np.int32)
        self.dst = rng.integers(0, self.n - 1, self.e).astype(np.int32)
        self.eattr = rng.normal(size=(self.e, self.h)).astype(np.float32)
        self.mask = np.ones(self.e, np.float32)
        self.mask[-5:] = 0.0
        self.src[-5:] = self.n - 1
        self.dst[-5:] = self.n - 1
        cap = int(np.bincount(self.dst[self.mask > 0]).max()) + 2
        self.tab, self.tab_mask, self.pos = build_incoming_table(
            self.dst, self.mask, self.n, cap, self.e - 1)
        self.params = init_transformer_conv(jax.random.PRNGKey(0), self.h,
                                            self.h, self.h)

    def _coo(self):
        return transformer_conv(self.params, jnp.asarray(self.x),
                                jnp.asarray(self.src), jnp.asarray(self.dst),
                                jnp.asarray(self.eattr), heads=self.heads,
                                edge_mask=jnp.asarray(self.mask))

    def _table(self):
        return transformer_conv_table(
            self.params, jnp.asarray(self.x), jnp.asarray(self.src),
            jnp.asarray(self.dst), jnp.asarray(self.eattr),
            jnp.asarray(self.tab), jnp.asarray(self.tab_mask),
            jnp.asarray(self.pos), heads=self.heads,
            edge_mask=jnp.asarray(self.mask))

    def test_forward_parity(self):
        np.testing.assert_allclose(np.asarray(self._table()),
                                   np.asarray(self._coo()), rtol=2e-4, atol=1e-5)

    def test_gradient_parity(self):
        def loss_coo(p, x):
            return (transformer_conv(p, x, jnp.asarray(self.src),
                                     jnp.asarray(self.dst), jnp.asarray(self.eattr),
                                     heads=self.heads,
                                     edge_mask=jnp.asarray(self.mask)) ** 2).sum()

        def loss_tab(p, x):
            return (transformer_conv_table(
                p, x, jnp.asarray(self.src), jnp.asarray(self.dst),
                jnp.asarray(self.eattr), jnp.asarray(self.tab),
                jnp.asarray(self.tab_mask), jnp.asarray(self.pos),
                heads=self.heads, edge_mask=jnp.asarray(self.mask)) ** 2).sum()

        x = jnp.asarray(self.x)
        g1 = jax.grad(loss_coo, argnums=(0, 1))(self.params, x)
        g2 = jax.grad(loss_tab, argnums=(0, 1))(self.params, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=1e-4)


class TestModelImplParity:
    def test_table_vs_coo_model(self):
        store = make_store(6, seed=4)
        budget = BatchBudget.plan(store, range(6), batch_size=6)
        batch = next(iter(BatchPacker(store, budget).pack(range(6))))
        base = dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                    angle_dim=store.angle_dim,
                    global_dim=store.global_scalar_dim + 230,
                    target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0)
        cfg_t = AlignnConfig(**base, conv_impl="table")
        cfg_c = AlignnConfig(**base, conv_impl="coo")
        params = init_alignn(jax.random.PRNGKey(0), cfg_t)
        mt, lt = alignn_apply(params, cfg_t, batch)
        mc, lc = alignn_apply(params, cfg_c, batch)
        np.testing.assert_allclose(np.asarray(mt), np.asarray(mc),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lc),
                                   rtol=1e-3, atol=1e-4)

    def test_table_dropout_deterministic(self):
        store = make_store(6, seed=4)
        budget = BatchBudget.plan(store, range(6), batch_size=6)
        batch = next(iter(BatchPacker(store, budget).pack(range(6))))
        cfg = AlignnConfig(node_dim=store.node_dim, edge_dim=store.edge_dim,
                           angle_dim=store.angle_dim,
                           global_dim=store.global_scalar_dim + 230,
                           target_dim=2, hidden=16, layers=1, heads=2,
                           dropout=0.2)
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        k = jax.random.PRNGKey(3)
        a, _ = alignn_apply(params, cfg, batch, train=True, rng=k)
        b, _ = alignn_apply(params, cfg, batch, train=True, rng=k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
