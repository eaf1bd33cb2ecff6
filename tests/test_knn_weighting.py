"""KNN density-weighting path (opt-in, reference train.py:930-1010)."""
import numpy as np
import pytest

from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare
from gnnep_tpu.train.knn_weights import compute_knn_weights
from gnnep_tpu.train.member import train_member
from gnnep_tpu.data.batching import epoch_batches

from synthetic import make_store

import jax


class TestKnnWeights:
    def test_weight_properties(self):
        store = make_store(20, seed=10)
        cfg = TrainConfig(batch_size=10, hidden=16, layers=1, heads=2,
                          ensemble_size=2, verbose=False)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        weights = compute_knn_weights(mc, params, batches, setup.store,
                                      k=5, eps=1e-6, alpha=0.75, beta=1.0,
                                      clip_min=0.2, clip_max=1.0)
        assert set(weights) == set(setup.train_idx)
        vals = np.array(list(weights.values()))
        assert abs(vals.mean() - 1.0) < 1e-6          # mean-normalized
        assert (vals > 0).all()
        # clip ratio bound survives normalization: max/min <= clip_max/clip_min
        assert vals.max() / vals.min() <= 1.0 / 0.2 + 1e-6

    def test_training_with_density_weighting(self):
        store = make_store(20, seed=10)
        cfg = TrainConfig(batch_size=10, hidden=16, layers=1, heads=2,
                          ensemble_size=2, epochs=4, verbose=False,
                          bootstrap=False, feature_jitter_std=0.0,
                          enable_density_weighting=True,
                          weight_warmup_epochs=2, knn_refresh=1, knn_k=3)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        params, metrics = train_member(
            setup.store, cfg, mc, setup.transformer, setup.budget, 7,
            setup.train_idx, setup.val_idx)
        assert np.isfinite(metrics.get("mae", np.nan))

    def test_snapshot_invariant_to_bootstrap_duplication(self):
        """The KNN embedding snapshot must cover UNIQUE train indices: the
        bootstrap resample contains duplicates, and duplicated embeddings at
        distance 0 inflate density (hence down-weighting) for multiply-drawn
        samples. The reference snapshots the train set once
        (train.py:930-1010)."""
        import gnnep_tpu.train.member as member_mod

        store = make_store(16, seed=3)
        cfg = TrainConfig(batch_size=8, hidden=16, layers=1, heads=2,
                          ensemble_size=2, epochs=3, verbose=False,
                          bootstrap=True, bootstrap_ratio=2.0,
                          feature_jitter_std=0.0,
                          enable_density_weighting=True,
                          weight_warmup_epochs=1, knn_refresh=1, knn_k=3)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        seen = []
        real = member_mod.compute_knn_weights

        def spy(model_cfg, params, snapshot_batches, st, **kw):
            batches = list(snapshot_batches)
            ids = np.concatenate([
                np.asarray(b.sample_index)[np.asarray(b.graph_mask) > 0]
                for b in batches])
            seen.append(ids)
            return real(model_cfg, params, iter(batches), st, **kw)

        member_mod.compute_knn_weights = spy
        try:
            train_member(setup.store, cfg, mc, setup.transformer,
                         setup.budget, 7, setup.train_idx, setup.val_idx)
        finally:
            member_mod.compute_knn_weights = real
        assert seen, "density weighting never snapshotted"
        for ids in seen:
            assert len(ids) == len(np.unique(ids)), \
                "snapshot contains bootstrap duplicates"

    def test_coverage_audit_passes_and_failure_skips_activation(self, capsys):
        import gnnep_tpu.train.member as member_mod

        store = make_store(16, seed=3)
        cfg = TrainConfig(batch_size=8, hidden=16, layers=1, heads=2,
                          ensemble_size=2, epochs=3, verbose=False,
                          bootstrap=False, feature_jitter_std=0.0,
                          enable_density_weighting=True,
                          weight_warmup_epochs=1, knn_refresh=1, knn_k=3,
                          knn_coverage_audit=True)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        _, metrics = train_member(
            setup.store, cfg, mc, setup.transformer, setup.budget, 7,
            setup.train_idx, setup.val_idx)
        out = capsys.readouterr().out
        assert "Coverage audit" in out and "missing=0" in out
        assert np.isfinite(metrics.get("mae", np.nan))

        # a weight map missing train ids must abort activation, not skew
        # the loss with silent default weights (train.py:1874-1903)
        real = member_mod.compute_knn_weights

        def broken(*a, **kw):
            w = real(*a, **kw)
            w.pop(sorted(w)[0])
            return w

        orig = member_mod.compute_knn_weights
        member_mod.compute_knn_weights = broken
        try:
            _, metrics = train_member(
                setup.store, cfg, mc, setup.transformer, setup.budget, 7,
                setup.train_idx, setup.val_idx)
        finally:
            member_mod.compute_knn_weights = orig
        out = capsys.readouterr().out
        assert "Coverage failure" in out
        assert np.isfinite(metrics.get("mae", np.nan))


class TestDeviceKnnBackend:
    def test_device_matches_host_backend(self):
        """Chunked GEMM+top_k kNN == exact host kNN (distances allclose;
        indices equal where no distance ties)."""
        from gnnep_tpu.train.knn_weights import knn_neighbors

        rng = np.random.default_rng(0)
        Z = rng.normal(size=(500, 24)).astype(np.float32)
        dd, ii = knn_neighbors(Z, 10, backend="device")
        dh, ih = knn_neighbors(Z, 10, backend="host")
        np.testing.assert_allclose(dd, dh, rtol=1e-4, atol=1e-4)
        # indices can only differ on exact-tie distances (none expected in
        # continuous random data)
        assert (ii == ih).mean() > 0.999

    def test_env_override(self, monkeypatch):
        from gnnep_tpu.train.knn_weights import knn_neighbors

        rng = np.random.default_rng(1)
        Z = rng.normal(size=(64, 8)).astype(np.float32)
        monkeypatch.setenv("GNNEP_KNN_BACKEND", "device")
        dd, _ = knn_neighbors(Z, 5)
        dh, _ = knn_neighbors(Z, 5, backend="host")
        np.testing.assert_allclose(dd, dh, rtol=1e-4, atol=1e-4)
