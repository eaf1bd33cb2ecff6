"""Production distributed training through the trainer/CLI (VERDICT r4
item 1): --data-shards/--edge-shards thread a Mesh(("data","edge")) into
`train_member`, which steps with the graph-aligned multi-chip program.

The equivalence claim under test: one mesh optimizer step over D·E packed
sub-batches computes exactly the single-device mean-loss gradient over the
union batch, so a mesh member whose epoch = one super-batch reproduces the
single-device member parameter-for-parameter (jitter/dropout off).
"""
import math

import jax
import numpy as np
import pytest

from gnnep_tpu.data.batching import epoch_batches
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.parallel.mesh import make_mesh
from gnnep_tpu.parallel.train_step import (make_aligned_train_step,
                                           stack_for_mesh)
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import member_plan, model_config, prepare
from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
from gnnep_tpu.train.member import train_member

from synthetic import make_store

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(**kw):
    base = dict(hidden=16, layers=1, heads=2, epochs=2, ensemble_size=1,
                feature_jitter_std=0.0, dropout=0.0, bootstrap=False,
                scan_steps=0, verbose=False, early_stop=100,
                val_frac=0.2, calib_frac=0.0, test_frac=0.0,
                batch_slack=1.8, batch_quantile=1.0)
    base.update(kw)
    return TrainConfig(**base)


class TestAlignedFullMetricsStep:
    def test_step_and_metrics_match_single_union(self):
        """full_metrics aligned step ≡ single-device step over the union
        batch: params AND every StepMetrics field agree."""
        store = make_store(16, seed=3)
        cfg1 = _cfg(batch_size=16)
        cfg4 = _cfg(batch_size=4)
        setup1 = prepare(cfg1, store)
        setup4 = prepare(cfg4, store)
        assert setup1.train_idx == setup4.train_idx
        b_union = epoch_batches(setup1.store, setup1.train_idx,
                                setup1.budget, shuffle=False)
        assert len(b_union) == 1, "union must be ONE batch for parity"
        b_parts = epoch_batches(setup4.store, setup4.train_idx,
                                setup4.budget, shuffle=False)
        assert len(b_parts) <= 4

        hyper = TrainHyper(feature_jitter_std=0.0)
        mc = model_config(cfg1, setup1.store)
        # both steps donate (params, opt_state): give each its own host copy
        params = jax.device_get(init_alignn(jax.random.PRNGKey(0), mc))
        smask = sigma_mask(params)

        sstep, sinit = make_train_step(mc, hyper, setup1.transformer.means,
                                       setup1.transformer.stds)
        p1, _, m1 = sstep(jax.tree.map(np.array, params), sinit(params),
                          smask, b_union[0], jax.random.PRNGKey(9),
                          3e-4, 1e-4)

        mesh = make_mesh(2, 2, devices=jax.devices()[:4])
        astep, ainit = make_aligned_train_step(
            mesh, mc, hyper, setup4.transformer.means,
            setup4.transformer.stds, full_metrics=True)
        p2, _, m2 = astep(jax.tree.map(np.array, params), ainit(params),
                          stack_for_mesh(b_parts, 4),
                          jax.random.PRNGKey(9), 3e-4, 1e-4, smask)

        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)
        for field in ("loss_sum", "n_graphs", "abs_err_sum", "sq_err_sum",
                      "n_elements", "logvar_sum", "max_var"):
            np.testing.assert_allclose(
                float(getattr(m2, field)), float(getattr(m1, field)),
                rtol=2e-3, atol=1e-6), field


class TestMeshMember:
    def test_mesh_member_matches_single_device(self):
        """A full train_member run on a (2,2) mesh — epoch = one super-batch
        — reproduces the single-device member's best params."""
        store = make_store(16, seed=5)
        cfg1 = _cfg(batch_size=64)
        setup1 = prepare(cfg1, store)
        n_train = len(member_plan(cfg1, setup1, 0)[2])
        b_mesh = max(1, math.ceil(n_train / 4))
        cfg4 = _cfg(batch_size=b_mesh, data_shards=2, edge_shards=2)
        setup4 = prepare(cfg4, store)

        seed1, _, tr1, val1, mc1, mcfg1 = member_plan(cfg1, setup1, 0)
        seed4, _, tr4, val4, mc4, mcfg4 = member_plan(cfg4, setup4, 0)
        assert (seed1, tr1, val1) == (seed4, tr4, val4)

        p1, met1 = train_member(setup1.store, mcfg1, mc1, setup1.transformer,
                                setup1.budget, seed1, tr1, val1)
        p4, met4 = train_member(setup4.store, mcfg4, mc4, setup4.transformer,
                                setup4.budget, seed4, tr4, val4)
        assert math.isfinite(met4["mae"])
        np.testing.assert_allclose(met4["mae"], met1["mae"],
                                   rtol=1e-3, atol=1e-5)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)

    def test_mesh_member_scan_steps_finite(self):
        """Mesh member with the aligned scan-over-steps inner loop (several
        super-batches per scan chunk) trains to finite metrics."""
        store = make_store(16, seed=6)
        cfg = _cfg(batch_size=2, data_shards=2, edge_shards=1, scan_steps=2,
                   epochs=2)
        setup = prepare(cfg, store)
        seed, _, tr, val, mc, mcfg = member_plan(cfg, setup, 0)
        params, met = train_member(setup.store, mcfg, mc, setup.transformer,
                                   setup.budget, seed, tr, val)
        assert math.isfinite(met["mae"])
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all()


class TestMeshCli:
    def test_cli_mesh_matches_single_device(self, tmp_path):
        """End-to-end through `python -m gnnep_tpu.cli.train`: the
        --data-shards 2 --edge-shards 2 ensemble's saved members match the
        single-device run's within tolerance (VERDICT r4 item 1 done
        criterion)."""
        from gnnep_tpu.cli.train import main as train_main
        from gnnep_tpu.data.splits import derive_splits
        from gnnep_tpu.data.store import GraphStore, save_sample, write_index
        from gnnep_tpu.train.artifacts import load_member

        store = make_store(24, seed=11)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for i in range(store.n_graphs):
            save_sample(data_dir, store.sample(i))
        write_index(data_dir, store)

        tr, _, _, _, _ = derive_splits(
            GraphStore.load_dir(str(data_dir)).group_keys(),
            42, 0.2, 0.1, 0.0, 1)
        b_mesh = max(1, math.ceil(len(tr) / 4))
        common = ["--data-dir", str(data_dir), "--epochs", "2",
                  "--ensemble-size", "1", "--hidden", "16", "--layers", "1",
                  "--heads", "2", "--dropout", "0.0",
                  "--feature-jitter-std", "0.0", "--no-bootstrap-train",
                  "--scan-steps", "0", "--val-frac", "0.2",
                  "--calib-frac", "0.1", "--test-frac", "0.0",
                  "--batch-slack", "1.8", "--batch-quantile", "1.0",
                  "--early-stop", "100", "--quiet", "--device", "cpu"]
        train_main(common + ["--save-dir", str(tmp_path / "ens1"),
                             "--batch-size", "64"])
        train_main(common + ["--save-dir", str(tmp_path / "ens4"),
                             "--batch-size", str(b_mesh),
                             "--data-shards", "2", "--edge-shards", "2"])

        p1, _ = load_member(tmp_path / "ens1" / "model_0.npz")
        p4, _ = load_member(tmp_path / "ens4" / "model_0.npz")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)
        assert (tmp_path / "ens4" / "conformal.json").exists()
        assert (tmp_path / "ens4" / "scaler_state.npz").exists()


class TestMeshValidation:
    def test_too_many_shards_raises(self):
        store = make_store(8, seed=1)
        cfg = _cfg(batch_size=4, data_shards=16, edge_shards=2)
        setup = prepare(cfg, store)
        seed, _, tr, val, mc, mcfg = member_plan(cfg, setup, 0)
        with pytest.raises(ValueError, match="devices"):
            train_member(setup.store, mcfg, mc, setup.transformer,
                         setup.budget, seed, tr, val)

    def test_member_parallel_conflict_raises(self):
        from gnnep_tpu.train.ensemble import run_training

        store = make_store(8, seed=1)
        cfg = _cfg(batch_size=4, data_shards=2, member_parallel="vmap")
        with pytest.raises(ValueError, match="member-parallel"):
            run_training(cfg, store)
