"""Eval-time win64 reconciliation (VERDICT r2 item 1).

Checkpoints embed TRAINING-time packer window bounds, while evaluate/predict
pack batches to a FRESH budget planned over the eval data. If eval data is
denser, the fused Pallas kernels' VMEM windows (sized from the checkpoint's
bounds) under-cover a 64-target group's edge span and silently drop tail
edges — wrong predictions, no error. These tests demonstrate the divergence
with stale bounds and prove `train.loop.reconcile_win64` +
`data.batching.verify_win64` close it: the fused path matches the table path
bit-for-bit once the config windows to the active budget.

Reference contract: eval-side reconciliation in
`/root/reference/scripts/evaluate.py:539-574` (dataset reconciled to the
checkpoint before any forward runs).
"""
import dataclasses as dc
import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from synthetic import make_store  # noqa: E402

from gnnep_tpu.data.batching import (BatchBudget, BatchPacker, measure_win64,
                                     verify_win64)
from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn
from gnnep_tpu.train.loop import reconcile_win64


@pytest.fixture(scope="module")
def dense_batch_and_budget():
    """An 'eval' batch packed to its own (fresh) budget, denser than the
    stale checkpoint bounds used below."""
    store = make_store(10, seed=7)
    budget = BatchBudget.plan(store, range(10), batch_size=10)
    batch = next(iter(BatchPacker(store, budget).pack(range(10))))
    return store, budget, batch


def _cfg_kwargs(store):
    return dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                angle_dim=store.angle_dim,
                global_dim=store.global_scalar_dim + 230,
                target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0)


def _stale_bounds(batch):
    """Checkpoint-style bounds strictly below the batch's measured spans."""
    span_e = measure_win64(np.asarray(batch.edge_dst), batch.nodes.shape[0])
    span_l = measure_win64(np.asarray(batch.lg_dst), batch.edge_src.shape[0])
    stale_e = max(32, (span_e // 2) // 32 * 32)
    stale_l = max(32, (span_l // 2) // 32 * 32)
    assert stale_e < span_e and stale_l < span_l, (
        f"fixture not dense enough: spans ({span_e},{span_l}) vs stale "
        f"({stale_e},{stale_l})")
    return stale_e, stale_l


class TestWin64Reconcile:
    def test_stale_bounds_silently_diverge(self, dense_batch_and_budget):
        """The hazard itself: fused kernels under stale (training-time)
        bounds drop tail edges and return different numbers than the exact
        table path — with no error raised."""
        store, _, batch = dense_batch_and_budget
        stale_e, stale_l = _stale_bounds(batch)
        base = _cfg_kwargs(store)
        cfg_stale = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                                 edge_win64=stale_e, lg_win64=stale_l)
        cfg_table = AlignnConfig(**base, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg_stale)
        mf, _ = alignn_apply(params, cfg_stale, batch)
        mt, _ = alignn_apply(params, cfg_table, batch)
        assert not np.allclose(np.asarray(mf), np.asarray(mt),
                               rtol=5e-4, atol=5e-5), (
            "expected divergence under stale win64 bounds (the silent "
            "wrong-output hazard); did the kernel stop using win64?")

    def test_reconciled_bounds_match_table(self, dense_batch_and_budget):
        """After reconcile_win64(ckpt_cfg, eval_budget) the fused path
        agrees with the table path on the same dense batch."""
        store, budget, batch = dense_batch_and_budget
        stale_e, stale_l = _stale_bounds(batch)
        base = _cfg_kwargs(store)
        ckpt_cfg = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                                edge_win64=stale_e, lg_win64=stale_l)
        cfg = reconcile_win64(ckpt_cfg, budget)
        assert cfg.edge_win64 == budget.edge_win64
        assert cfg.lg_win64 == budget.lg_win64
        assert cfg.edge_src_win64 == budget.edge_src_win64
        assert cfg.lg_src_win64 == budget.lg_src_win64
        cfg_table = AlignnConfig(**base, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        mf, lf = alignn_apply(params, cfg, batch)
        mt, lt = alignn_apply(params, cfg_table, batch)
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mt),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lt),
                                   rtol=5e-4, atol=5e-5)

    def test_verify_win64_guards(self, dense_batch_and_budget):
        """verify_win64 raises for the stale config and passes for the
        reconciled one (and for unenforced bounds)."""
        store, budget, batch = dense_batch_and_budget
        stale_e, stale_l = _stale_bounds(batch)
        base = _cfg_kwargs(store)
        stale = AlignnConfig(**base, edge_win64=stale_e, lg_win64=stale_l)
        with pytest.raises(ValueError, match="silently drop"):
            verify_win64([batch], stale)
        verify_win64([batch], reconcile_win64(stale, budget))
        verify_win64([batch], AlignnConfig(**base))  # all bounds 0: no-op

    def test_eval_runner_path_is_reconciled(self, tmp_path,
                                            dense_batch_and_budget):
        """End-to-end: Ensemble.predict packs a fresh budget and must not
        carry the checkpoint's stale bounds into the kernels. Train a tiny
        member on a SPARSE subset (small bounds in the checkpoint), then
        predict over the full store; predictions must match a table-path
        ensemble bit-for-bit."""
        store, _, _ = dense_batch_and_budget
        from gnnep_tpu.data.transforms import FeatureScaler, LogTransformer
        from gnnep_tpu.infer.predict import Ensemble
        from gnnep_tpu.train.artifacts import save_member, save_scaler_state

        scaler = FeatureScaler.fit(store, list(range(10)))
        std_store = scaler.apply(store)
        transformer = LogTransformer.fit(store.y)
        base = _cfg_kwargs(store)
        # checkpoint carries deliberately-tiny (stale) bounds
        cfg_f = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                             edge_win64=32, lg_win64=32,
                             edge_src_win64=32, lg_src_win64=32)
        params = init_alignn(jax.random.PRNGKey(1), cfg_f)
        d = tmp_path / "ens"
        d.mkdir()
        save_member(d / "model_0.npz", params, cfg_f)
        save_scaler_state(d / "scaler_state.npz", scaler, transformer,
                          {"global_scalar_dim": store.global_scalar_dim})
        ens = Ensemble.load(d)
        res_fused = ens.predict(std_store, range(10), batch_size=10)

        cfg_t = dc.replace(cfg_f, conv_impl="table", force_fused=False)
        save_member(d / "model_0.npz", params, cfg_t)
        ens_t = Ensemble.load(d)
        res_table = ens_t.predict(std_store, range(10), batch_size=10)
        for a, b in zip(res_fused, res_table):
            np.testing.assert_allclose(a["mu"], b["mu"], rtol=5e-4, atol=5e-5)
            np.testing.assert_allclose(a["sigma"], b["sigma"],
                                       rtol=5e-3, atol=5e-5)


def test_evaluate_runner_path_is_reconciled(tmp_path):
    """run_evaluation packs a fresh budget over the eval data; a checkpoint
    carrying stale (tiny) win64 bounds must yield the same metrics through
    the fused path as through the table path."""
    import json

    from gnnep_tpu.data.transforms import FeatureScaler, LogTransformer
    from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation
    from gnnep_tpu.train.artifacts import save_member, save_scaler_state

    store = make_store(16, seed=9)
    scaler = FeatureScaler.fit(store, list(range(16)))
    transformer = LogTransformer.fit(store.y)
    base = dict(node_dim=store.node_dim, edge_dim=store.edge_dim,
                angle_dim=store.angle_dim,
                global_dim=store.global_scalar_dim + 230,
                target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0)
    cfg_f = AlignnConfig(**base, conv_impl="fused", force_fused=True,
                         edge_win64=32, lg_win64=32,
                         edge_src_win64=32, lg_src_win64=32)
    params = init_alignn(jax.random.PRNGKey(2), cfg_f)

    results = {}
    for tag, cfg in (("fused", cfg_f),
                     ("table", dc.replace(cfg_f, conv_impl="table",
                                          force_fused=False))):
        d = tmp_path / tag
        d.mkdir()
        save_member(d / "model_0.npz", params, cfg)
        save_scaler_state(d / "scaler_state.npz", scaler, transformer,
                          {"global_scalar_dim": store.global_scalar_dim})
        results[tag] = run_evaluation(EvalConfig(
            ensemble_dir=str(d), data_dir="unused",
            output_dir=str(d / "eval"), ensemble_size=1,
            eval_split="test", batch_size=16, make_plots=False), store)
    np.testing.assert_allclose(results["fused"]["overall"]["mae"],
                               results["table"]["overall"]["mae"],
                               rtol=1e-4)
    np.testing.assert_allclose(results["fused"]["overall"]["rmse"],
                               results["table"]["overall"]["rmse"],
                               rtol=1e-4)
