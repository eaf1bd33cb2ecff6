"""Evaluation-suite tests (L5): metric numerics on constructed cases and the
end-to-end evaluate runner over trained artifacts."""
import json
import math

import numpy as np
import pytest

from gnnep_tpu.data.transforms import LogTransformer
from gnnep_tpu.evaluate import metrics as M
from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import run_training
from gnnep_tpu.train.metrics import error_stats

from synthetic import make_store


class TestMetricNumerics:
    def test_r2_perfect_and_mean_predictor(self, rng):
        y = rng.normal(10, 3, (100, 2))
        np.testing.assert_allclose(M.r2_score(y, y), 1.0)
        mean_pred = np.tile(y.mean(axis=0), (100, 1))
        np.testing.assert_allclose(M.r2_score(mean_pred, y), 0.0, atol=1e-9)

    def test_skewness_signs(self, rng):
        right = rng.exponential(1.0, (5000, 1))
        assert M.residual_skewness(right)[0] > 0.5
        sym = rng.normal(0, 1, (5000, 1))
        assert abs(M.residual_skewness(sym)[0]) < 0.2

    def test_gaussian_nll_matches_formula(self):
        mean = np.zeros((4, 1))
        std = np.ones((4, 1))
        y = np.zeros((4, 1))
        want = 0.5 * math.log(2 * math.pi)
        np.testing.assert_allclose(M.gaussian_nll(mean, std, y), want, rtol=1e-9)

    def test_reliability_curve_well_calibrated(self, rng):
        n = 20000
        y = rng.normal(0, 1, (n, 1))
        nom, emp = M.reliability_curve(np.zeros((n, 1)), np.ones((n, 1)), y,
                                       [0.5, 0.9])
        np.testing.assert_allclose(emp[0], [0.5, 0.9], atol=0.02)
        assert M.scalar_ece(nom, emp[0].tolist()) < 0.02

    def test_diversity_identical_members(self, rng):
        y = np.exp(rng.normal(4, 0.5, (50, 2)))
        t = LogTransformer.fit(y)
        mz = t.transform(y) + rng.normal(0, 0.2, (50, 2))
        means = np.stack([mz, mz, mz])
        stds = np.full((3, 50, 2), 0.3)
        var_z = (stds ** 2).mean(0)
        stats = error_stats(t.inverse(mz), y)
        d = M.diversity_metrics(means, stds, var_z, y, t, stats)
        # identical members: no epistemic variance, zero ensemble gain,
        # correlation 1, always agreeing on over/under-prediction
        assert d["epistemic_fraction_mean"] < 1e-9
        assert abs(d["ensemble_gain_percent"]) < 1e-6
        np.testing.assert_allclose(d["member_correlation_matrix"], 1.0, atol=1e-9)
        assert d["q_statistic_mean"] > 0.999

    def test_kendall_w_consistent_ordering(self, rng):
        y = np.exp(rng.normal(4, 0.5, (50, 2)))
        t = LogTransformer.fit(y)
        mz = t.transform(y) + rng.normal(0, 0.2, (50, 2))
        # members with distinct constant offsets: perfectly concordant ranks
        means = np.stack([mz, mz + 0.3, mz + 0.6])
        stds = np.full((3, 50, 2), 0.3)
        var_z = (stds ** 2).mean(0) + (means ** 2).mean(0) - means.mean(0) ** 2
        stats = error_stats(t.inverse(means.mean(0)), y)
        d = M.diversity_metrics(means, stds, var_z, y, t, stats)
        assert d["kendall_w"] > 0.999

    def test_diversity_anticorrelated_members(self, rng):
        y = np.exp(rng.normal(4, 0.5, (200, 2)))
        t = LogTransformer.fit(y)
        y_z = t.transform(y)
        noise = rng.normal(0, 0.3, (200, 2))
        means = np.stack([y_z + noise, y_z - noise])
        stds = np.full((2, 200, 2), 0.3)
        mix = means.mean(0)
        var_z = (stds ** 2).mean(0) + (means ** 2).mean(0) - mix ** 2
        stats = error_stats(t.inverse(mix), y)
        d = M.diversity_metrics(means, stds, var_z, y, t, stats)
        assert d["q_statistic_mean"] < -0.9        # opposite over/under
        assert d["ensemble_gain_percent"] > 20.0   # averaging cancels noise

    def test_sharpness_monotone_widths(self, rng):
        y = np.exp(rng.normal(4, 1, (300, 2)))
        t = LogTransformer.fit(y)
        mz = t.transform(y) + rng.normal(0, 0.3, (300, 2))
        scores = np.abs(t.transform(y) - mz)
        widths, covers = M.sharpness_vs_coverage(scores[:150], mz[150:],
                                                 y[150:], t, [0.5, 0.8, 0.95])
        assert (np.diff(widths, axis=1) > 0).all()  # wider at higher coverage
        assert covers[0, -1] >= covers[0, 0]


@pytest.mark.slow
class TestEvaluateRunner:
    def test_end_to_end_metrics_json(self, tmp_path):
        store = make_store(28, seed=6)
        tcfg = TrainConfig(
            save_dir=str(tmp_path / "ens"), batch_size=8, epochs=2, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False)
        run_training(tcfg, store)
        ecfg = EvalConfig(
            ensemble_dir=str(tmp_path / "ens"),
            output_dir=str(tmp_path / "eval"),
            batch_size=8, seed=42, val_frac=0.15, calib_frac=0.15,
            test_frac=0.15, ensemble_size=2, eval_split="test")
        result = run_evaluation(ecfg, store)
        out = tmp_path / "eval" / "test"
        saved = json.loads((out / "metrics.json").read_text())
        assert saved["split"] == "test"
        for key in ("rmse", "mae", "r2", "gaussian_nll", "ece_gaussian",
                    "kendall_w", "q_statistic_mean", "ensemble_gain_percent",
                    "conformal_coverage", "epistemic_fraction_mean"):
            assert key in saved["overall"], key
        assert set(saved["per_target"]) == {"bulk_modulus", "shear_modulus"}
        for png in ("parity.png", "residuals_vs_pred.png",
                    "reliability_gaussian.png", "sharpness_vs_coverage.png",
                    "error_variance.png", "corr_heatmap.png"):
            assert (out / png).exists(), png

        # the serving fast path through the same pipeline: bf16 metrics
        # must track f32 closely (sub-GPa on this tiny fixture)
        bcfg = EvalConfig(
            ensemble_dir=str(tmp_path / "ens"),
            output_dir=str(tmp_path / "eval_bf16"),
            batch_size=8, seed=42, val_frac=0.15, calib_frac=0.15,
            test_frac=0.15, ensemble_size=2, eval_split="test",
            make_plots=False, compute_dtype="bfloat16")
        b = run_evaluation(bcfg, store)
        assert abs(b["overall"]["mae"] - result["overall"]["mae"]) \
            < max(0.5, 0.02 * result["overall"]["mae"])

    def test_fold_split_evaluation(self, tmp_path):
        store = make_store(28, seed=6)
        tcfg = TrainConfig(
            save_dir=str(tmp_path / "ens"), batch_size=8, epochs=1, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False)
        run_training(tcfg, store)
        ecfg = EvalConfig(
            ensemble_dir=str(tmp_path / "ens"), output_dir=str(tmp_path / "eval"),
            batch_size=8, seed=42, val_frac=0.15, calib_frac=0.15,
            test_frac=0.15, ensemble_size=2, eval_split="fold", fold_index=1,
            make_plots=False)
        result = run_evaluation(ecfg, store)
        assert result["split"] == "fold1"


@pytest.mark.slow
class TestEvaluateWithoutConformal:
    def test_runner_handles_missing_conformal(self, tmp_path):
        """Evaluation must degrade gracefully when conformal.json is absent
        (identity debias, no conformal coverage metrics)."""
        store = make_store(24, seed=6)
        tcfg = TrainConfig(
            save_dir=str(tmp_path / "ens"), batch_size=8, epochs=1, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42,
            val_frac=0.15, calib_frac=0.15, test_frac=0.15,
            bootstrap=False, feature_jitter_std=0.0, verbose=False)
        run_training(tcfg, store)
        (tmp_path / "ens" / "conformal.json").unlink()
        ecfg = EvalConfig(
            ensemble_dir=str(tmp_path / "ens"), output_dir=str(tmp_path / "eval"),
            batch_size=8, seed=42, val_frac=0.15, calib_frac=0.15,
            test_frac=0.15, ensemble_size=2, eval_split="test",
            make_plots=False)
        result = run_evaluation(ecfg, store)
        assert result["overall"]["conformal_coverage"] is None
        assert math.isfinite(result["overall"]["rmse"])
