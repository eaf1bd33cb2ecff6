"""Serving fast-path tests: scan-amortized collection + bf16 eval forward.

The scanned collector must be numerically IDENTICAL to the per-batch loop
(same per-batch program, dispatched through one lax.scan — PERF.md round-5
serving entry); the bf16 rung is a tolerance contract (trunk in bf16,
heads/floor in f32, exactly the training fast path's cast discipline).
Capability mirror: the reference serves fp32-only per-batch
(`/root/reference/scripts/predict.py:560-607`) — both rungs here are
TPU-native additions, flag-gated off by default for parity.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gnnep_tpu.data.batching import BatchBudget, epoch_batches
from gnnep_tpu.models.alignn import AlignnConfig, init_alignn
from gnnep_tpu.train.loop import (collect_predictions,
                                  collect_predictions_scanned, make_forward)

from synthetic import make_store


def _store_batches_cfg(n_graphs=24, batch_size=3, hidden=16, layers=2,
                       heads=2, seed=0):
    store = make_store(n_graphs, seed=seed)
    budget = BatchBudget.plan(store, range(n_graphs), batch_size=batch_size)
    batches = epoch_batches(store, range(n_graphs), budget, shuffle=False)
    cfg = AlignnConfig(node_dim=store.node_dim, edge_dim=store.edge_dim,
                       angle_dim=store.angle_dim,
                       global_dim=store.global_scalar_dim + 230,
                       target_dim=2, hidden=hidden, layers=layers,
                       heads=heads, dropout=0.1)
    return store, batches, cfg


class TestScannedCollection:
    def test_scan_collect_matches_per_batch(self):
        _, batches, cfg = _store_batches_cfg()
        assert len(batches) >= 5, "fixture must exercise the scan path"
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9), params, batches)
        got = collect_predictions_scanned(cfg, -2.9, params, batches, chunk=4)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_tail_padding_discards_duplicates(self):
        # 7 batches, chunk 4 → second chunk padded 3→4; padded rows must
        # not leak into the output
        _, batches, cfg = _store_batches_cfg(n_graphs=21, batch_size=3)
        assert len(batches) == 7
        params = init_alignn(jax.random.PRNGKey(1), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9), params, batches)
        got = collect_predictions_scanned(cfg, -2.9, params, batches, chunk=4)
        assert got[0].shape == ref[0].shape
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))

    def test_few_batches_fall_back_to_per_batch_loop(self):
        _, batches, cfg = _store_batches_cfg(n_graphs=6, batch_size=3)
        assert len(batches) <= 4
        params = init_alignn(jax.random.PRNGKey(2), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9), params, batches)
        got = collect_predictions_scanned(cfg, -2.9, params, batches, chunk=4)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_small_split_reuses_built_scan_program(self):
        # evaluate's pattern: a large split builds the scan program, then a
        # small split of the SAME budget must ride it (padded) instead of
        # compiling the per-batch program — and produce identical results
        _, batches, cfg = _store_batches_cfg(n_graphs=24, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(5), cfg)
        collect_predictions_scanned(cfg, -2.9, params, batches, chunk=4)
        small = batches[:2]
        ref = collect_predictions(make_forward(cfg, -2.9), params, small)
        from gnnep_tpu.train import loop as loop_mod
        key = (cfg, -2.9, "float32", 4,
               loop_mod._batch_shape_key(small[0]))
        assert key in loop_mod._SCAN_PROGRAMS_BUILT
        got = collect_predictions_scanned(cfg, -2.9, params, small, chunk=4)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_mixed_arena_shapes_fall_back(self):
        # two budgets → different arena shapes; the scanned collector must
        # detect the mismatch and produce the per-batch loop's result
        store, batches_a, cfg = _store_batches_cfg(n_graphs=18, batch_size=3)
        budget_b = BatchBudget.plan(store, range(6), batch_size=2)
        batches_b = epoch_batches(store, range(6), budget_b, shuffle=False)
        mixed = batches_a + batches_b
        params = init_alignn(jax.random.PRNGKey(3), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9), params, mixed)
        got = collect_predictions_scanned(cfg, -2.9, params, mixed, chunk=4)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestBf16Forward:
    def test_bf16_close_to_f32(self):
        _, batches, cfg = _store_batches_cfg(n_graphs=9, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        m32, s32, y32, i32 = collect_predictions(
            make_forward(cfg, -2.9), params, batches)
        m16, s16, y16, i16 = collect_predictions(
            make_forward(cfg, -2.9, "bfloat16"), params, batches)
        np.testing.assert_array_equal(i32, i16)
        np.testing.assert_array_equal(y32, y16)
        assert np.isfinite(m16).all() and (s16 > 0).all()
        # z-space means are O(1); bf16 trunk should track f32 to ~1e-2
        assert np.max(np.abs(m16 - m32)) < 5e-2
        assert np.max(np.abs(np.log(s16) - np.log(s32))) < 5e-2

    def test_bf16_scanned_matches_bf16_per_batch(self):
        _, batches, cfg = _store_batches_cfg(n_graphs=18, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(1), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9, "bfloat16"),
                                  params, batches)
        got = collect_predictions_scanned(cfg, -2.9, params, batches,
                                          compute_dtype="bfloat16", chunk=4)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestMultiDeviceBf16:
    def test_auto_collect_bf16_multi_device_matches_single(self):
        # with >1 visible devices collect_predictions_auto fans batches out
        # through the graph-aligned forward; the bf16 cast must ride along
        # (each device runs the same per-batch program → identical results)
        if len(jax.devices()) <= 1:
            pytest.skip("needs the virtual multi-device mesh")
        from gnnep_tpu.parallel.train_step import collect_predictions_auto

        _, batches, cfg = _store_batches_cfg(n_graphs=18, batch_size=3)
        params = init_alignn(jax.random.PRNGKey(4), cfg)
        ref = collect_predictions(make_forward(cfg, -2.9, "bfloat16"),
                                  params, batches)
        got = collect_predictions_auto(cfg, -2.9, params, batches,
                                       compute_dtype="bfloat16")
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestCliPlumbing:
    def test_predict_cli_exposes_compute_dtype(self):
        from gnnep_tpu.cli.predict import build_parser
        args = build_parser().parse_args(
            ["--mode", "random", "--compute-dtype", "bfloat16"])
        assert args.compute_dtype == "bfloat16"

    def test_evaluate_cli_exposes_compute_dtype(self):
        from gnnep_tpu.cli.evaluate import build_parser
        args = build_parser().parse_args(["--compute-dtype", "bfloat16"])
        assert args.compute_dtype == "bfloat16"

    def test_predict_cli_exposes_giant_shards(self):
        from gnnep_tpu.cli.predict import build_parser
        args = build_parser().parse_args(
            ["--mode", "random", "--giant-shards", "4"])
        assert args.giant_shards == 4
        assert build_parser().parse_args(["--mode", "random"]).giant_shards == 0
