"""Inverse-frequency target-bin loss weighting (--freq-gamma > 0).

VERDICT r2 item 2: the bin weights computed by `train.bins` must actually
reach the per-sample NLL. Semantics mirror the reference's intent
(`/root/reference/scripts/train.py:404-421,1106,1411-1414`): per-target bin
lookup over log-targets, reduced to one scalar per sample (mean across
targets), applied to the NLL exactly as KNN density weights are and composed
multiplicatively when both are active.
"""
import dataclasses

import jax
import numpy as np

from gnnep_tpu.data.batching import BatchBudget, epoch_batches
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.bins import (compute_bin_statistics, freq_sample_weights,
                                  freq_weights_for_store, gather_bin_values)
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare
from gnnep_tpu.train.loop import TrainHyper, hetero_nll

from synthetic import make_store


class TestBinGather:
    def test_gather_matches_manual_digitize(self):
        rng = np.random.default_rng(0)
        y = np.exp(rng.normal(4.0, 1.0, size=(64, 2)))
        edges, weights, _, _ = compute_bin_statistics(y, num_bins=4, gamma=0.5)
        got = gather_bin_values(y, edges, weights)
        for d in range(2):
            idx = np.digitize(np.log(y[:, d]), edges[d, 1:-1], right=False)
            np.testing.assert_allclose(got[:, d], weights[d][idx])
        # per-sample scalar = mean across targets
        np.testing.assert_allclose(freq_sample_weights(y, edges, weights),
                                   got.mean(axis=1).astype(np.float32))

    def test_gamma_zero_is_all_ones(self):
        rng = np.random.default_rng(1)
        y = np.exp(rng.normal(4.0, 1.0, size=(32, 2)))
        edges, weights, _, _ = compute_bin_statistics(y, num_bins=4, gamma=0.0)
        np.testing.assert_allclose(freq_weights_for_store(y, edges, weights),
                                   1.0)

    def test_rare_bins_upweighted(self):
        rng = np.random.default_rng(2)
        # 90% duplicated low-modulus values collapse the quantile edges
        # (→ linspace fallback, as in the reference), leaving the sparse
        # high-modulus bin rare: it must get weight > 1
        y = np.concatenate([np.full((90, 2), 20.0),
                            np.exp(rng.normal(6.0, 0.2, size=(10, 2)))])
        edges, weights, _, _ = compute_bin_statistics(y, num_bins=4, gamma=0.5)
        w = freq_weights_for_store(y, edges, weights)
        assert w[90:].mean() > w[:90].mean() > 0


class TestWeightedLoss:
    def _setup(self, gamma):
        store = make_store(8, seed=3)
        cfg = TrainConfig(batch_size=8, hidden=16, layers=1, heads=2,
                          freq_bins=3, freq_gamma=gamma, epochs=1,
                          val_frac=0.0, calib_frac=0.0, test_frac=0.0,
                          verbose=False)
        setup = prepare(cfg, store)
        return store, cfg, setup

    def test_gamma_pos_step_loss_is_hand_weighted_nll(self):
        """The jitted loss under grafted freq weights equals a hand-computed
        weighted NLL (float64 numpy from the same forward outputs)."""
        store, cfg, setup = self._setup(gamma=0.7)
        s = setup.store
        w = freq_weights_for_store(s.y, setup.bin_edges, setup.bin_weights)
        assert not np.allclose(w, 1.0), "fixture: weights must be non-trivial"
        batches = epoch_batches(s, setup.train_idx, setup.budget,
                                shuffle=False, weights=w)
        batch = batches[0]
        gm = np.asarray(batch.graph_mask)
        np.testing.assert_allclose(
            np.asarray(batch.weight)[gm > 0],
            w[np.asarray(batch.sample_index)[gm > 0]])

        mc = model_config(cfg, s, budget=setup.budget)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        mu, sd = setup.transformer.means, setup.transformer.stds
        y_z = (np.log(np.maximum(np.asarray(batch.y), 1e-12)) - mu) / sd
        loss, (mean, logvar, _) = hetero_nll(
            params, mc, hyper, batch, y_z.astype(np.float32),
            jax.random.PRNGKey(1), train=True)

        mean = np.asarray(mean, dtype=np.float64)
        logvar = np.maximum(np.asarray(logvar, dtype=np.float64),
                            hyper.min_logvar_floor)
        nll = 0.5 * (logvar + (mean - y_z) ** 2 / np.exp(logvar))
        nll = nll * np.asarray(batch.weight)[:, None]
        n_real = max(gm.sum(), 1.0)
        expect = (nll.mean(axis=1) * gm).sum() / n_real
        expect += 0.1 * ((0.5 * logvar) ** 2 * gm[:, None]).sum() / (
            n_real * y_z.shape[1])
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)

    def test_gamma_zero_batches_unweighted(self):
        """gamma=0: run_training passes no freq weights and packed batches
        carry unit weights — numerics identical to the pre-fix path."""
        store, cfg, setup = self._setup(gamma=0.0)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        for b in batches:
            gm = np.asarray(b.graph_mask)
            np.testing.assert_allclose(np.asarray(b.weight)[gm > 0], 1.0)

    def test_vmap_member_parallel_applies_freq_weights(self, tmp_path,
                                                       monkeypatch):
        """member_parallel='vmap' routes the freq weights through the
        packer's weights= path: every packed train batch carries them."""
        import gnnep_tpu.parallel.ensemble_vmap as ev

        captured = []
        real = ev.epoch_batches

        def spy(store, idx, budget, **kw):
            batches = real(store, idx, budget, **kw)
            if kw.get("shuffle"):
                captured.append(kw.get("weights"))
            return batches

        monkeypatch.setattr(ev, "epoch_batches", spy)
        store = make_store(8, seed=3)
        from gnnep_tpu.train.ensemble import run_training

        run_training(TrainConfig(
            batch_size=8, hidden=16, layers=1, heads=2, epochs=1,
            ensemble_size=2, member_parallel="vmap", freq_bins=3,
            freq_gamma=0.5, val_frac=0.125, calib_frac=0.125,
            test_frac=0.125, early_stop=1, verbose=False, bootstrap=False,
            save_dir=str(tmp_path)), store)
        assert captured and all(w is not None for w in captured)
        assert not np.allclose(captured[0], 1.0)

    def test_run_training_wires_freq_weights(self, tmp_path, monkeypatch):
        """run_training passes a non-trivial freq_weights array to
        train_member iff freq_gamma > 0."""
        import gnnep_tpu.train.ensemble as ens

        captured = {}
        real = ens.train_member

        def spy(store, cfg, mc, transformer, budget, seed, tr, vl,
                freq_weights=None, **kw):
            captured["w"] = freq_weights
            return real(store, cfg, mc, transformer, budget, seed, tr, vl,
                        freq_weights=freq_weights, **kw)

        monkeypatch.setattr(ens, "train_member", spy)
        store = make_store(8, seed=3)
        base = dict(batch_size=8, hidden=16, layers=1, heads=2, epochs=1,
                    ensemble_size=1, freq_bins=3, val_frac=0.125,
                    calib_frac=0.125, test_frac=0.125, early_stop=1,
                    verbose=False, bootstrap=False)
        ens.run_training(TrainConfig(**base, freq_gamma=0.5,
                                     save_dir=str(tmp_path / "a")), store)
        assert captured["w"] is not None and not np.allclose(captured["w"], 1.0)
        ens.run_training(TrainConfig(**base, freq_gamma=0.0,
                                     save_dir=str(tmp_path / "b")), store)
        assert captured["w"] is None
