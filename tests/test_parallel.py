"""Multi-chip correctness tests on a virtual 8-device CPU mesh: the
edge-sharded forward/step must reproduce single-device numerics exactly
(same math, different reduction layout)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gnnep_tpu.data.batching import BatchBudget, BatchPacker, epoch_batches
from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn
from gnnep_tpu.parallel.mesh import make_mesh
from gnnep_tpu.parallel.train_step import (make_aligned_forward,
                                           make_aligned_train_step,
                                           make_sharded_forward,
                                           make_sharded_train_step,
                                           stack_for_mesh)
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare, run_training
from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask

from synthetic import make_store

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(n=12, batch_size=6):
    store = make_store(n, seed=7)
    cfg = TrainConfig(batch_size=batch_size, hidden=16, layers=2, heads=2,
                      ensemble_size=2, verbose=False, feature_jitter_std=0.0)
    setup = prepare(cfg, store)
    mc = model_config(cfg, setup.store)
    return store, cfg, setup, mc


class TestShardedForward:
    def test_matches_single_device_1x4(self):
        store, cfg, setup, mc = _setup()
        params = init_alignn(jax.random.PRNGKey(0), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        b = batches[0]
        want_mean, want_logvar = alignn_apply(params, mc, b)

        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        fwd = make_sharded_forward(mesh, mc, floor=-2.9)
        stacked = stack_for_mesh([b], 1)
        got_mean, got_logvar = fwd(params, stacked)
        np.testing.assert_allclose(np.asarray(got_mean)[0], np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_logvar)[0],
                                   np.maximum(np.asarray(want_logvar), -2.9),
                                   rtol=2e-4, atol=2e-5)

    def test_matches_single_device_2x4(self):
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        params = init_alignn(jax.random.PRNGKey(1), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        assert len(batches) == 2
        mesh = make_mesh(2, 4)
        fwd = make_sharded_forward(mesh, mc, floor=-2.9)
        got_mean, _ = fwd(params, stack_for_mesh(batches, 2))
        for d, b in enumerate(batches):
            want_mean, _ = alignn_apply(params, mc, b)
            np.testing.assert_allclose(np.asarray(got_mean)[d],
                                       np.asarray(want_mean),
                                       rtol=2e-4, atol=2e-5)


class TestShardedTrainStep:
    def test_matches_global_gradient_step(self):
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(2), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        mu = jnp.asarray(setup.transformer.means, dtype=jnp.float32)
        sd = jnp.asarray(setup.transformer.stds, dtype=jnp.float32)

        # reference: single-device global-mean gradient over both batches
        def total_loss(p):
            loss_sum = 0.0
            count = 0.0
            for b in batches:
                mean, logvar = alignn_apply(p, mc, b)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(b.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                nll = nll * b.weight[:, None]
                loss_sum += (nll.mean(axis=1) * b.graph_mask).sum()
                loss_sum += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                                  * b.graph_mask[:, None]).sum() / 2.0
                count += b.graph_mask.sum()
            return loss_sum / count

        want_grads = jax.grad(total_loss)(params)

        # sharded gradients through the edge-partitioned forward
        from gnnep_tpu.parallel.edge_shard import sharded_apply
        from gnnep_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS
        from gnnep_tpu.parallel.train_step import batch_pspecs
        from jax.sharding import PartitionSpec as P
        from gnnep_tpu.parallel.mesh import shard_map

        mesh = make_mesh(2, 4)

        def device_grads(p, batch):
            batch = jax.tree.map(lambda x: x[0], batch)

            def local_loss(pp):
                mean, logvar = sharded_apply(pp, mc, batch, axis_name=EDGE_AXIS,
                                             train=False)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                loss = (nll.mean(axis=1) * batch.graph_mask).sum()
                loss += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                              * batch.graph_mask[:, None]).sum() / 2.0
                return loss

            g = jax.grad(local_loss)(p)
            g = jax.lax.pmean(g, EDGE_AXIS)  # see train_step.py note
            g = jax.lax.psum(g, DATA_AXIS)
            n = jax.lax.psum(batch.graph_mask.sum(), DATA_AXIS)
            return jax.tree.map(lambda x: x / n, g)

        got_grads = jax.jit(shard_map(
            device_grads, mesh=mesh, in_specs=(P(), batch_pspecs()),
            out_specs=P(), check=False))(params, stack_for_mesh(batches, 2))
        for w, g in zip(jax.tree.leaves(want_grads), jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=1e-6)

        # and the full jitted train step runs and counts graphs correctly
        step, init_opt = make_sharded_train_step(mesh, mc, hyper,
                                                 setup.transformer.means,
                                                 setup.transformer.stds)
        got, _, loss, n = step(params, init_opt(params),
                               stack_for_mesh(batches, 2),
                               jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert float(n) == sum(float(np.asarray(b.graph_mask).sum()) for b in batches)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(got))

    def test_comm_chunks_invariance(self):
        """The pipelined (row-chunked) all-reduce produces the same trunk
        output as the single-psum formulation, for eval AND for training
        with dropout active (masks are drawn full-size then sliced)."""
        import dataclasses

        from gnnep_tpu.parallel.edge_shard import sharded_apply
        from gnnep_tpu.parallel.mesh import EDGE_AXIS
        from gnnep_tpu.parallel.train_step import batch_pspecs, stack_for_mesh
        from jax.sharding import PartitionSpec as P
        from gnnep_tpu.parallel.mesh import shard_map

        store, cfg, setup, mc = _setup(n=12, batch_size=4)
        mc = dataclasses.replace(mc, dropout=0.3)
        params = init_alignn(jax.random.PRNGKey(3), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:1]
        mesh = make_mesh(1, 8)
        stacked = stack_for_mesh(batches, 1)

        def run(chunks, train):
            def device_fwd(p, batch):
                batch = jax.tree.map(lambda x: x[0], batch)
                rng = jax.random.PRNGKey(11) if train else None
                m, lv = sharded_apply(p, mc, batch, axis_name=EDGE_AXIS,
                                      train=train, rng=rng,
                                      comm_chunks=chunks)
                return m, lv

            return jax.jit(shard_map(
                device_fwd, mesh=mesh, in_specs=(P(), batch_pspecs()),
                out_specs=(P(), P()), check=False))(params, stacked)

        for train in (False, True):
            base = run(1, train)
            for chunks in (3, 8):
                got = run(chunks, train)
                for w, g in zip(base, got):
                    np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                               rtol=1e-6, atol=1e-6)

    def test_pad_rank_contributes_nothing(self):
        """Stacking fewer batches than data ranks: padded rank is inert."""
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        hyper = TrainHyper(feature_jitter_std=0.0)
        params = init_alignn(jax.random.PRNGKey(3), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:1]
        mesh = make_mesh(2, 4)
        step, init_opt = make_sharded_train_step(mesh, mc, hyper,
                                                 setup.transformer.means,
                                                 setup.transformer.stds)
        got, _, loss, n = step(params, init_opt(params),
                               stack_for_mesh(batches, 2),
                               jax.random.PRNGKey(0), 3e-4, 3e-4, smask)
        assert float(n) == float(np.asarray(batches[0].graph_mask).sum())
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(got))


class TestAlignedStep:
    """Graph-aligned edge partitioning (the production fast path): every
    device runs the standard fused/table forward on a complete sub-batch;
    the only collective is the grads+loss+count psum."""

    def test_forward_matches_single_device(self):
        store, cfg, setup, mc = _setup(n=24, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        mesh = make_mesh(2, 4)
        fwd = make_aligned_forward(mesh, mc, floor=-2.9)
        got_mean, got_logvar = fwd(params, stack_for_mesh(batches[:8], 8))
        for d, b in enumerate(batches[:8]):
            want_mean, want_logvar = alignn_apply(params, mc, b)
            np.testing.assert_allclose(np.asarray(got_mean)[d],
                                       np.asarray(want_mean),
                                       rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(np.asarray(got_logvar)[d],
                                       np.maximum(np.asarray(want_logvar),
                                                  -2.9),
                                       rtol=2e-4, atol=2e-5)

    def test_matches_global_gradient_step(self):
        """One aligned step over 8 sub-batches on a 2×4 mesh == the
        single-device global-mean-loss gradient over their union."""
        store, cfg, setup, mc = _setup(n=24, batch_size=3)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(2), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:8]
        assert len(batches) >= 2
        mu = jnp.asarray(setup.transformer.means, dtype=jnp.float32)
        sd = jnp.asarray(setup.transformer.stds, dtype=jnp.float32)

        def total_loss(p):
            loss_sum = 0.0
            count = 0.0
            for b in batches:
                mean, logvar = alignn_apply(p, mc, b)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(b.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                nll = nll * b.weight[:, None]
                loss_sum += (nll.mean(axis=1) * b.graph_mask).sum()
                loss_sum += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                                  * b.graph_mask[:, None]
                                                  ).sum() / 2.0
                count += b.graph_mask.sum()
            return loss_sum / count

        want_grads = jax.grad(total_loss)(params)

        from gnnep_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS
        from gnnep_tpu.parallel.train_step import aligned_pspecs
        from jax.sharding import PartitionSpec as P
        from gnnep_tpu.parallel.mesh import shard_map

        mesh = make_mesh(2, 4)

        def device_grads(p, batch):
            batch = jax.tree.map(lambda x: x[0], batch)

            def local_loss(pp):
                mean, logvar = alignn_apply(pp, mc, batch)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                loss = (nll.mean(axis=1) * batch.graph_mask).sum()
                loss += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                              * batch.graph_mask[:, None]
                                              ).sum() / 2.0
                return loss

            g = jax.grad(local_loss)(p)
            g, n = jax.lax.psum((g, batch.graph_mask.sum()),
                                (DATA_AXIS, EDGE_AXIS))
            return jax.tree.map(lambda x: x / n, g)

        got_grads = jax.jit(shard_map(
            device_grads, mesh=mesh, in_specs=(P(), aligned_pspecs()),
            out_specs=P(), check=False))(params,
                                             stack_for_mesh(batches, 8))
        for w, g in zip(jax.tree.leaves(want_grads),
                        jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=1e-6)

        # the full jitted aligned step runs and counts graphs correctly
        step, init_opt = make_aligned_train_step(mesh, mc, hyper,
                                                 setup.transformer.means,
                                                 setup.transformer.stds)
        got, _, loss, n = step(params, init_opt(params),
                               stack_for_mesh(batches, 8),
                               jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert float(n) == sum(float(np.asarray(b.graph_mask).sum())
                               for b in batches)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(got))

    def test_pad_slots_contribute_nothing(self):
        """Fewer sub-batches than mesh slots: padded slots are inert."""
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        hyper = TrainHyper(feature_jitter_std=0.0)
        params = init_alignn(jax.random.PRNGKey(3), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        mesh = make_mesh(2, 4)
        step, init_opt = make_aligned_train_step(mesh, mc, hyper,
                                                 setup.transformer.means,
                                                 setup.transformer.stds)
        got, _, loss, n = step(params, init_opt(params),
                               stack_for_mesh(batches, 8),
                               jax.random.PRNGKey(0), 3e-4, 3e-4, smask)
        assert float(n) == sum(float(np.asarray(b.graph_mask).sum())
                               for b in batches)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(got))


class TestCollectPredictionsAuto:
    def test_matches_single_device_loop(self):
        """Multi-device collection (graph-aligned forward fan-out) returns
        exactly what the single-device loop returns, in the same order."""
        from gnnep_tpu.parallel.train_step import collect_predictions_auto
        from gnnep_tpu.train.loop import collect_predictions, make_forward

        store, cfg, setup, mc = _setup(n=24, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        assert len(batches) > 1
        want = collect_predictions(make_forward(mc, -2.9), params, batches)
        got = collect_predictions_auto(mc, -2.9, params, batches)
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.slow
class TestVmapEnsemble:
    def test_run_training_vmap_mode(self, tmp_path):
        store = make_store(24, seed=5)
        cfg = TrainConfig(
            save_dir=str(tmp_path), batch_size=24, epochs=2, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False,
            member_parallel="vmap")
        summary = run_training(cfg, store)
        assert (tmp_path / "model_1.npz").exists()
        assert "test_stats" in summary

    def test_shard_mode_matches_vmap(self, tmp_path):
        """member_parallel='shard' (one member per mesh device via
        shard_map) trains the same members as 'vmap' — identical seeds,
        streams, and update math, different execution."""
        store = make_store(24, seed=5)
        # one epoch: the two executions are semantically identical but the
        # GEMM accumulation orders differ (batched vs per-device), and that
        # float noise compounds through Adam across epochs
        base = dict(batch_size=24, epochs=1, hidden=16, layers=1, heads=2,
                    ensemble_size=2, seed=42, val_frac=0.15, calib_frac=0.15,
                    test_frac=0.15, bootstrap=False, feature_jitter_std=0.0,
                    verbose=False)
        cfg_s = TrainConfig(save_dir=str(tmp_path / "shard"),
                            member_parallel="shard", **base)
        cfg_v = TrainConfig(save_dir=str(tmp_path / "vmap"),
                            member_parallel="vmap", **base)
        run_training(cfg_s, store)
        run_training(cfg_v, store)
        from gnnep_tpu.train.artifacts import load_member

        for i in range(2):
            ps, _ = load_member(tmp_path / "shard" / f"model_{i}.npz")
            pv, _ = load_member(tmp_path / "vmap" / f"model_{i}.npz")
            # tolerance set by the Adam step size: near-zero gradients are
            # sign-unstable under different accumulation orders, moving a
            # first step by up to ~2·lr (6e-4); a member/device ROUTING bug
            # would produce O(1) mismatches
            for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(pv)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0.05, atol=1e-3)

    def test_vmap_per_member_dropout(self, tmp_path):
        """Heterogeneous member dropout rates ride through vmap mode as a
        traced [M] rate vector (previously rejected with a ValueError)."""
        store = make_store(24, seed=5)
        cfg = TrainConfig(
            save_dir=str(tmp_path), batch_size=24, epochs=1, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            member_dropouts=[0.0, 0.4],
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False,
            member_parallel="vmap")
        summary = run_training(cfg, store)
        assert (tmp_path / "model_1.npz").exists()
        assert "test_stats" in summary

    def test_traced_dropout_matches_static(self):
        """A traced dropout_override reproduces the static-rate forward
        bit-for-bit (same rng stream, same mask)."""
        store, cfg, setup, mc = _setup(n=12, batch_size=4)
        mc_drop = dataclasses.replace(mc, dropout=0.35)
        params = init_alignn(jax.random.PRNGKey(0), mc_drop)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        batch = batches[0]
        rng = jax.random.PRNGKey(7)
        want = alignn_apply(params, mc_drop, batch, train=True, rng=rng)

        @jax.jit
        def traced(rate):
            return alignn_apply(params, mc_drop, batch, train=True, rng=rng,
                                dropout_override=rate)

        got = traced(jnp.asarray(0.35, jnp.float32))
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-6)

    def test_shard_mode_too_many_members(self):
        store = make_store(12, seed=5)
        cfg = TrainConfig(batch_size=12, epochs=1, hidden=16, layers=1,
                          heads=2, ensemble_size=9, seed=42,
                          bootstrap=False, verbose=False,
                          member_parallel="shard")
        with pytest.raises(ValueError, match="one member per device"):
            run_training(cfg, store)


class TestEdgeShardedTableImpl:
    """The scatter-free implicit-table formulation of the edge-sharded conv
    (table_widths=...) must reproduce the COO formulation and single-device
    numerics — forward, dropout-active forward, gradients, and on diluted
    batches with measured widths."""

    def test_forward_matches_coo_and_single_device(self):
        from gnnep_tpu.parallel.train_step import measure_table_widths

        store, cfg, setup, mc = _setup()
        params = init_alignn(jax.random.PRNGKey(0), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        b = batches[0]
        want_mean, want_logvar = alignn_apply(params, mc, b)
        widths = measure_table_widths([b])

        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        stacked = stack_for_mesh([b], 1)
        fwd_t = make_sharded_forward(mesh, mc, floor=-2.9,
                                     table_widths=widths)
        got_mean, got_logvar = fwd_t(params, stacked)
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_logvar)[0],
                                   np.maximum(np.asarray(want_logvar), -2.9),
                                   rtol=2e-4, atol=2e-5)
        # bit-level agreement with the COO formulation is not required
        # (different reduction order), but they must agree tightly
        fwd_c = make_sharded_forward(mesh, mc, floor=-2.9)
        coo_mean, _ = fwd_c(params, stacked)
        np.testing.assert_allclose(np.asarray(got_mean), np.asarray(coo_mean),
                                   rtol=1e-5, atol=1e-6)

    def test_dropout_parity_with_coo(self):
        """Dropout keep masks are drawn in edge space from the same rng in
        both impls, so train-mode outputs must match closely."""
        from gnnep_tpu.parallel.edge_shard import sharded_apply
        from gnnep_tpu.parallel.mesh import EDGE_AXIS
        from gnnep_tpu.parallel.train_step import (batch_pspecs,
                                                   measure_table_widths)
        from jax.sharding import PartitionSpec as P
        from gnnep_tpu.parallel.mesh import shard_map

        store, cfg, setup, mc = _setup(n=12, batch_size=4)
        mc = dataclasses.replace(mc, dropout=0.25)
        params = init_alignn(jax.random.PRNGKey(3), mc)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        widths = measure_table_widths([b])
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        stacked = stack_for_mesh([b], 1)

        def run(tw):
            def device_fwd(p, batch):
                batch = jax.tree.map(lambda x: x[0], batch)
                m, lv = sharded_apply(p, mc, batch, axis_name=EDGE_AXIS,
                                      train=True, rng=jax.random.PRNGKey(7),
                                      table_widths=tw)
                return m, lv

            return jax.jit(shard_map(
                device_fwd, mesh=mesh, in_specs=(P(), batch_pspecs()),
                out_specs=(P(), P()), check=False))(params, stacked)

        want = run(None)
        got = run(widths)
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    def test_gradients_match_single_device(self):
        from gnnep_tpu.parallel.train_step import measure_table_widths
        from gnnep_tpu.train.loop import TrainHyper, sigma_mask

        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(2), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        widths = measure_table_widths(batches)
        mesh = make_mesh(2, 4)
        mu, sd = setup.transformer.means, setup.transformer.stds

        # one optimizer step: table-impl sharded vs COO sharded step
        step_t, init_t = make_sharded_train_step(mesh, mc, hyper, mu, sd,
                                                 table_widths=widths)
        step_c, init_c = make_sharded_train_step(mesh, mc, hyper, mu, sd)
        stacked = stack_for_mesh(batches, 2)
        params2 = jax.tree.map(jnp.array, params)  # steps donate params
        p_t, _, loss_t, n_t = step_t(params, init_t(params), stacked,
                                     jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        p_c, _, loss_c, n_c = step_c(params2, init_c(params2), stacked,
                                     jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert float(n_t) == float(n_c)
        np.testing.assert_allclose(float(loss_t), float(loss_c),
                                   rtol=1e-5, atol=1e-7)
        for a, b_ in zip(jax.tree.leaves(p_t), jax.tree.leaves(p_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)

    def test_diluted_batch_with_measured_widths(self):
        """Dilution interleaves padding rows into real CSR spans, so row
        spans exceed in-degrees; measured widths must still give exact
        parity with the single-device forward."""
        import dataclasses as dc

        from gnnep_tpu.data.batching import BatchPacker
        from gnnep_tpu.parallel.train_step import measure_table_widths

        store, cfg, setup, mc = _setup(n=12, batch_size=12)
        budget = dc.replace(setup.budget, edge_win64=96, lg_win64=160)
        batch = next(iter(BatchPacker(setup.store, budget).pack(range(12))))
        em = np.asarray(batch.edge_mask)
        interior = (em == 0) & (np.asarray(batch.edge_dst)
                                < batch.nodes.shape[0] - 1)
        assert interior.any(), "test setup: no interior padding produced"
        widths = measure_table_widths([batch])

        params = init_alignn(jax.random.PRNGKey(5), mc)
        want_mean, _ = alignn_apply(params, mc, batch)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        fwd = make_sharded_forward(mesh, mc, floor=-2.9, table_widths=widths)
        got_mean, _ = fwd(params, stack_for_mesh([batch], 1))
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)


class TestRowWindowedEdgeShard:
    """Per-rank row windows (compute-scaling mode of the windowed
    formulation): reductions run on [R]-row slices, outputs must match the
    full-N path and the single-device forward exactly."""

    def test_forward_matches_single_device(self):
        from gnnep_tpu.parallel.train_step import (measure_row_windows,
                                                   measure_table_widths)

        store, cfg, setup, mc = _setup(n=24, batch_size=24)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        widths = measure_table_widths([b])
        rows = measure_row_windows([b], 4)
        # the fixture must actually engage the windowed-row path (the LG
        # conv's target arena exceeds one 128-row window here)
        assert rows[0] < b.nodes.shape[0] or rows[1] < b.edge_src.shape[0]
        want_mean, _ = alignn_apply(params, mc, b)

        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        stacked = stack_for_mesh([b], 1)
        fwd = make_sharded_forward(mesh, mc, floor=-2.9, table_widths=widths,
                                   row_windows=rows)
        got_mean, _ = fwd(params, stacked)
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        # and against the full-N windowed path (identical math, same order)
        fwd_full = make_sharded_forward(mesh, mc, floor=-2.9,
                                        table_widths=widths)
        full_mean, _ = fwd_full(params, stacked)
        np.testing.assert_allclose(np.asarray(got_mean),
                                   np.asarray(full_mean),
                                   rtol=1e-6, atol=1e-7)

    def test_train_step_with_row_windows(self):
        from gnnep_tpu.parallel.train_step import (measure_row_windows,
                                                   measure_table_widths)
        from gnnep_tpu.train.loop import TrainHyper, sigma_mask

        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        mc = dataclasses.replace(mc, dropout=0.2)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(2), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        widths = measure_table_widths(batches)
        rows = measure_row_windows(batches, 4)
        mesh = make_mesh(2, 4)
        mu, sd = setup.transformer.means, setup.transformer.stds
        step_r, init_r = make_sharded_train_step(mesh, mc, hyper, mu, sd,
                                                 table_widths=widths,
                                                 row_windows=rows)
        step_f, init_f = make_sharded_train_step(mesh, mc, hyper, mu, sd,
                                                 table_widths=widths)
        stacked = stack_for_mesh(batches, 2)
        params2 = jax.tree.map(jnp.array, params)
        p_r, _, loss_r, n_r = step_r(params, init_r(params), stacked,
                                     jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        p_f, _, loss_f, n_f = step_f(params2, init_f(params2), stacked,
                                     jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert float(n_r) == float(n_f)
        np.testing.assert_allclose(float(loss_r), float(loss_f),
                                   rtol=1e-5, atol=1e-7)
        for a, b_ in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)

    def test_misaligned_arena_disables_row_window(self):
        """A hand-built row arena whose size is NOT a multiple of 128 cannot
        keep the 128-aligned window-start invariant the win64 group bounds
        rely on — the windowed conv must fall back to full-N reductions (and
        stay numerically exact) instead of risking a misaligned window."""
        from gnnep_tpu.parallel.mesh import shard_map
        from jax.sharding import PartitionSpec as P

        from gnnep_tpu.ops.graph_attention import (init_transformer_conv,
                                                   transformer_conv)
        from gnnep_tpu.parallel import edge_shard

        heads, hidden = 2, 16
        # n % 64 == 0 (kernel blocks viable) but n % 128 != 0 (window
        # start alignment NOT guaranteed); per-shard edge slices stay
        # 128-multiples so the windowed path is otherwise engaged
        n, deg = 192, 8
        rng = np.random.default_rng(3)
        e_total = n * deg
        dst = np.repeat(np.arange(n, dtype=np.int32), deg)   # CSR-sorted
        src = rng.integers(0, n, size=e_total).astype(np.int32)
        x = rng.standard_normal((n, hidden)).astype(np.float32)
        ea = rng.standard_normal((e_total, 8)).astype(np.float32)
        row_ptr = np.arange(n + 1, dtype=np.int32) * deg
        params = init_transformer_conv(jax.random.PRNGKey(0), hidden, hidden,
                                       edge_dim=8)

        want = transformer_conv(params, x, src, dst, ea, heads=heads)

        mesh = make_mesh(1, 4, devices=jax.devices()[:4])

        def device_fn(p, xx, ss, dd, aa, rp):
            return edge_shard._windowed_conv(
                p, xx, ss, dd, aa, heads=heads, axis_name="edge",
                edge_mask=None, dropout_rate=0.0, dropout_rng=None,
                comm_chunks=1, row_post=None, row_ptr=rp,
                table_width=deg + 1, win64=0, row_window=128)

        assert (n * deg // 4) % 128 == 0  # windowed path viable per shard

        got = jax.jit(shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(), P(), P("edge"), P("edge"), P("edge"), P()),
            out_specs=P(), check=False))(params, x, src, dst, ea, row_ptr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
