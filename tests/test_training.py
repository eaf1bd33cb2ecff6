"""Training-runtime tests (L4): schedules, selection cascade, calibration
numerics, loss-step behavior, and a small end-to-end ensemble run."""
import dataclasses
import math

import jax
import numpy as np
import pytest

from gnnep_tpu.data.batching import BatchBudget, epoch_batches
from gnnep_tpu.data.transforms import LogTransformer
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.bins import compute_bin_statistics
from gnnep_tpu.train.calibrate import (apply_conformal_intervals,
                                       conformal_calibration, ensemble_mixture,
                                       fit_affine_debias)
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare, run_training
from gnnep_tpu.train.loop import (TrainHyper, cosine_lr, make_forward,
                                  make_train_step, sigma_mask)
from gnnep_tpu.train.member import BestSelector
from gnnep_tpu.train.metrics import error_stats, eval_metrics

from synthetic import make_store


class TestSchedules:
    def test_cosine_warmup_then_decay(self):
        lr = cosine_lr(10, 2, 1e-3, 1e-5)
        assert abs(lr(0) - 5e-4) < 1e-12      # warmup epoch 1: 1/2
        assert abs(lr(1) - 1e-3) < 1e-12      # warmup complete
        assert lr(2) > lr(5) > lr(9)
        assert lr(9) >= 1e-5 - 1e-12

    def test_degenerate_warmup(self):
        lr = cosine_lr(1, 5, 1e-3, 1e-5)      # warmup clamped below total
        assert math.isfinite(lr(0)) and lr(0) > 0


class TestBestSelector:
    def cfg(self, **kw):
        return TrainConfig(**{"delta_mae": 0.5, "delta_mae_reset": 0.5,
                              "conformal_alpha": 0.1, **kw})

    def m(self, mae, cov=0.9, ece=0.05, spear=0.5):
        return {"mae": mae, "coverage": cov, "ece": ece, "spearman": spear,
                "nll": 0.0, "rmse": mae, "mae_log": 0.1,
                "logvar_mean": 0.0, "sigma_max": 1.0}

    def test_lower_mae_wins(self):
        sel = BestSelector(self.cfg())
        assert sel.consider(1, self.m(10.0))
        assert sel.consider(2, self.m(8.0))
        assert sel.best_epoch == 2

    def test_tie_breaks_by_coverage_gap(self):
        sel = BestSelector(self.cfg())
        assert sel.consider(1, self.m(10.0, cov=0.7))
        assert sel.consider(2, self.m(10.1, cov=0.9))   # tied mae, better cov
        assert sel.best_epoch == 2

    def test_tie_breaks_by_ece_then_spearman(self):
        sel = BestSelector(self.cfg())
        sel.consider(1, self.m(10.0, cov=0.9, ece=0.08))
        assert sel.consider(2, self.m(10.0, cov=0.9, ece=0.02))
        assert sel.best_epoch == 2
        assert sel.consider(3, self.m(10.0, cov=0.9, ece=0.02, spear=0.9))
        assert sel.best_epoch == 3

    def test_significant_improvement_flag(self):
        sel = BestSelector(self.cfg())
        sel.consider(1, self.m(10.0))
        assert sel.significant_improve
        sel.consider(2, self.m(9.8))     # within reset tolerance
        assert not sel.significant_improve
        sel.consider(3, self.m(9.0))
        assert sel.significant_improve


class TestCalibration:
    def test_mixture_variance_law(self, rng):
        means = rng.normal(size=(5, 40, 2))
        varis = np.abs(rng.normal(size=(5, 40, 2))) + 0.1
        mean, var = ensemble_mixture(means, varis)
        np.testing.assert_allclose(mean, means.mean(0))
        want = varis.mean(0) + means.var(0)
        np.testing.assert_allclose(var, want, rtol=1e-6)

    def test_affine_debias_recovers_linear_map(self, rng):
        pred = rng.normal(size=(200, 2))
        target = pred * np.array([1.2, 0.8]) + np.array([0.3, -0.1])
        a, b = fit_affine_debias(pred, target)
        np.testing.assert_allclose(a, [1.2, 0.8], atol=1e-10)
        np.testing.assert_allclose(b, [0.3, -0.1], atol=1e-10)

    def test_conformal_coverage_on_gaussian(self, rng):
        n = 2000
        y = np.exp(rng.normal(4.0, 1.0, size=(n, 2)))
        t = LogTransformer.fit(y)
        y_z = t.transform(y)
        mean_z = y_z + rng.normal(0, 0.5, size=(n, 2))
        std_z = np.full((n, 2), 0.5)
        conf = conformal_calibration(mean_z[:1000], std_z[:1000], y[:1000],
                                     t, alpha=0.1, method="scaled")
        _, lo, hi = apply_conformal_intervals(mean_z[1000:], std_z[1000:], conf, t)
        cov = ((y[1000:] >= lo) & (y[1000:] <= hi)).mean()
        assert 0.85 < cov < 0.95

    def test_absolute_fallback_without_sigma(self):
        y = np.exp(np.random.default_rng(0).normal(4, 1, (100, 2)))
        t = LogTransformer.fit(y)
        conf = conformal_calibration(t.transform(y), None, y, t, 0.1, "scaled")
        assert conf["method"] == "absolute"


class TestBins:
    def test_quantile_bins(self, rng):
        y = np.exp(rng.normal(4, 1, size=(500, 2)))
        edges, weights, scales, probs = compute_bin_statistics(y, 6, 0.5)
        assert edges.shape == (2, 7) and weights.shape == (2, 6)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)
        np.testing.assert_allclose(weights.mean(axis=1), 1.0, atol=1e-9)

    def test_single_bin(self):
        y = np.full((10, 2), 5.0)
        edges, weights, scales, probs = compute_bin_statistics(y, 1, 0.0)
        assert np.isinf(edges[0, 0]) and np.isinf(edges[0, 1])


class TestTrainStep:
    def test_loss_decreases_and_sigma_mask(self):
        store = make_store(8, seed=3)
        cfg = TrainConfig(batch_size=8, hidden=16, layers=1, heads=2,
                          ensemble_size=2, verbose=False)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        hyper = TrainHyper(feature_jitter_std=0.0)
        step, init_opt = make_train_step(mc, hyper, setup.transformer.means,
                                         setup.transformer.stds)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        opt = init_opt(params)
        smask = sigma_mask(params)
        flat = jax.tree_util.tree_leaves(smask)
        assert sum(bool(x) for x in flat) == 2  # logvar head w + b only

        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        losses = []
        key = jax.random.PRNGKey(1)
        for it in range(30):
            for b in batches:
                key, k = jax.random.split(key)
                params, opt, m = step(params, opt, smask, b, k, 3e-3, 3e-3)
            losses.append(float(m.loss_sum) / max(float(m.n_graphs), 1))
        assert losses[-1] < losses[0]

    def test_scan_step_matches_sequential(self):
        """make_scan_train_step(K batches) ≡ K sequential make_train_step
        calls with the same per-step keys."""
        from gnnep_tpu.train.loop import make_scan_train_step, stack_batches

        store = make_store(8, seed=4)
        cfg = TrainConfig(batch_size=4, hidden=16, layers=1, heads=2,
                          ensemble_size=2, verbose=False)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        hyper = TrainHyper(feature_jitter_std=0.1)
        step, init_opt = make_train_step(mc, hyper, setup.transformer.means,
                                         setup.transformer.stds)
        multi, _ = make_scan_train_step(mc, hyper, setup.transformer.means,
                                        setup.transformer.stds)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        assert len(batches) == 2
        p0 = init_alignn(jax.random.PRNGKey(0), mc)
        smask = sigma_mask(p0)
        rng0 = jax.random.PRNGKey(5)

        p_seq, o_seq = p0, init_opt(p0)
        for b, k in zip(batches, jax.random.split(rng0, len(batches))):
            p_seq, o_seq, m_seq = step(p_seq, o_seq, smask, b, k, 3e-3, 3e-3)

        p1 = init_alignn(jax.random.PRNGKey(0), mc)
        p_scan, o_scan, ms = multi(p1, init_opt(p1), smask,
                                   stack_batches(batches), rng0, 3e-3, 3e-3)
        assert ms.loss_sum.shape == (2,)
        np.testing.assert_allclose(float(ms.loss_sum[-1]),
                                   float(m_seq.loss_sum), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-5, atol=1e-6)

    def test_eval_metrics_shapes(self, rng):
        y = np.exp(rng.normal(4, 0.5, (50, 2)))
        t = LogTransformer.fit(y)
        mean_z = t.transform(y) + rng.normal(0, 0.3, (50, 2))
        sigma = 0.2 + np.abs(rng.normal(0, 0.1, (50, 2)))  # varying σ: Spearman defined
        m = eval_metrics(mean_z, sigma, y, t)
        for k in ("nll", "mae", "rmse", "coverage", "ece", "spearman"):
            assert k in m and math.isfinite(m[k])
        assert 0.0 <= m["coverage"] <= 1.0

    def test_eval_metrics_partial_targets_still_finite(self, rng):
        """NaN target components (y_mask==0 rows from collect_predictions)
        are excluded element-wise — a partially-targeted val split must
        still produce finite selection metrics, or BestSelector silently
        never picks a best epoch (round-4 advisor finding)."""
        y = np.exp(rng.normal(4, 0.5, (50, 2)))
        t = LogTransformer.fit(y)
        mean_z = t.transform(y) + rng.normal(0, 0.3, (50, 2))
        sigma = 0.2 + np.abs(rng.normal(0, 0.1, (50, 2)))
        m_full = eval_metrics(mean_z, sigma, y.copy(), t)

        y_part = y.copy()
        y_part[::3, 1] = np.nan          # a third of samples missing target 1
        m_part = eval_metrics(mean_z, sigma, y_part, t)
        for k in ("nll", "mae", "rmse", "coverage", "ece", "spearman"):
            assert math.isfinite(m_part[k]), k
        assert 0.0 <= m_part["coverage"] <= 1.0
        # masked metrics over fully-valid data are unchanged
        for k in ("nll", "mae", "rmse", "coverage", "ece"):
            assert m_full[k] == pytest.approx(
                eval_metrics(mean_z, sigma, y, t)[k])
        # and the selector actually picks an epoch from partial metrics
        sel = BestSelector(TrainConfig())
        assert sel.consider(1, m_part)
        assert sel.best_epoch == 1

    def test_error_stats_table(self, rng):
        pred = rng.normal(100, 10, (40, 2))
        y = pred + rng.normal(0, 5, (40, 2))
        stats = error_stats(pred, y)
        assert set(stats) == {"bulk_modulus", "shear_modulus", "overall"}
        assert stats["overall"]["rmse"] > 0


@pytest.mark.slow
class TestEndToEnd:
    def test_run_training_sequential(self, tmp_path):
        store = make_store(24, seed=5)
        cfg = TrainConfig(
            save_dir=str(tmp_path), batch_size=8, epochs=3, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False)
        summary = run_training(cfg, store)
        assert (tmp_path / "model_0.npz").exists()
        assert (tmp_path / "model_1.npz").exists()
        assert (tmp_path / "scaler_state.npz").exists()
        assert (tmp_path / "conformal.json").exists()
        assert "test_stats" in summary
        assert math.isfinite(summary["test_stats"]["overall"]["mae"])

        # artifacts round-trip
        from gnnep_tpu.train.artifacts import (load_conformal, load_member,
                                               load_scaler_state)
        params, mc = load_member(tmp_path / "model_0.npz")
        assert mc.hidden == 16 and mc.layers == 1
        scaler, transformer, meta = load_scaler_state(tmp_path / "scaler_state.npz")
        assert transformer is not None and meta["dims"]["heads"] == 2
        conf = load_conformal(tmp_path / "conformal.json")
        assert conf["q"].shape == (2,) and conf["method"] in ("scaled", "absolute")

    def test_member_resume_skips_finished(self, tmp_path, capsys):
        """With resume on, a member whose final artifact exists is loaded
        instead of retrained (crash-recovery for long ensemble runs)."""
        from gnnep_tpu.data.store import save_sample

        data_dir = tmp_path / "data"
        for smp in __import__("synthetic").make_samples(24, seed=5):
            save_sample(data_dir, smp)
        cfg = TrainConfig(
            data_dir=str(data_dir), save_dir=str(tmp_path / "ens"),
            batch_size=8, epochs=2, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=True,
            resume=True)
        run_training(cfg)
        m0 = (tmp_path / "ens" / "model_0.npz").read_bytes()
        # delete member 1 only: re-run must skip member 0 and retrain 1
        (tmp_path / "ens" / "model_1.npz").unlink()
        capsys.readouterr()
        run_training(cfg)
        out = capsys.readouterr().out
        assert "loaded finished checkpoint model_0.npz" in out
        assert "Training ensemble member 2/2" in out
        assert (tmp_path / "ens" / "model_0.npz").read_bytes() == m0
        assert (tmp_path / "ens" / "model_1.npz").exists()

    def test_member_isolation_process(self, tmp_path):
        """member_isolation='process' trains each member in a subprocess and
        produces a working ensemble (the tunneled-client leak mitigation)."""
        from gnnep_tpu.data.store import save_sample

        data_dir = tmp_path / "data"
        for smp in __import__("synthetic").make_samples(24, seed=5):
            save_sample(data_dir, smp)
        cfg = TrainConfig(
            data_dir=str(data_dir), save_dir=str(tmp_path / "ens"),
            batch_size=8, epochs=2, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False,
            member_isolation="process")
        summary = run_training(cfg)
        assert (tmp_path / "ens" / "model_0.npz").exists()
        assert (tmp_path / "ens" / "model_1.npz").exists()
        assert math.isfinite(summary["test_stats"]["overall"]["mae"])

    def test_member_proc_matches_in_process(self, tmp_path):
        """The subprocess path must train the IDENTICAL member: same seed,
        fold, subset, config → byte-comparable parameters."""
        import json as _json
        import subprocess
        import sys as _sys
        from pathlib import Path as _P

        import dataclasses as _dc

        from gnnep_tpu.data.store import save_sample
        from gnnep_tpu.train.artifacts import load_member
        from gnnep_tpu.train.ensemble import (compute_freq_weights,
                                              member_plan)
        from gnnep_tpu.train.member import train_member

        data_dir = tmp_path / "data"
        for smp in __import__("synthetic").make_samples(24, seed=5):
            save_sample(data_dir, smp)
        cfg = TrainConfig(
            data_dir=str(data_dir), save_dir=str(tmp_path / "ens"),
            batch_size=8, epochs=2, hidden=16, layers=1, heads=2,
            ensemble_size=2, seed=42, val_frac=0.15, calib_frac=0.15,
            test_frac=0.15, bootstrap=False, feature_jitter_std=0.0,
            verbose=False)
        (tmp_path / "ens").mkdir()
        cfg_json = tmp_path / "ens" / "cfg.json"
        cfg_json.write_text(_json.dumps(_dc.asdict(cfg)))
        env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = str(_P(__file__).resolve().parents[1])
        r = subprocess.run(
            [_sys.executable, "-m", "gnnep_tpu.train.member_proc",
             str(cfg_json), "0"], env=env, capture_output=True, text=True,
            cwd=_P(__file__).resolve().parents[1])
        assert r.returncode == 0, r.stderr[-2000:]
        sub_params, sub_mc = load_member(tmp_path / "ens" / "model_0.npz")

        setup = prepare(cfg)
        fw = compute_freq_weights(cfg, setup)
        seed_i, _, train_i, holdout, mc, member_cfg = member_plan(cfg, setup, 0)
        params, _ = train_member(setup.store, member_cfg, mc,
                                 setup.transformer, setup.budget, seed_i,
                                 train_i, holdout, freq_weights=fw)
        import jax
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(sub_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
