"""Quantify the bf16 serving rung's accuracy cost on a trained flagship model.

The round-5 serving fast path (`--compute-dtype bfloat16` on predict/
evaluate, PERF.md "Round 5: serving") runs the trunk in bf16 — 4.7× the
f32 forward on a v5e chip. This driver answers the question the flag's
docstring must not hand-wave: what does bf16 do to the PREDICTIONS of a
really-trained model?

1. offline corpus (make_offline_corpus --mp-real --hetero) → fetch CLI
   featurization (knn12), exactly the mp_realistic recipe;
2. flagship-arch ensemble trained in bf16 (the training fast path —
   matching the flagship runs);
3. test-split evaluation TWICE — compute_dtype float32 vs bfloat16 —
   plus per-member raw prediction deltas (z-space μ, log-σ);
4. reports/bf16_serving/{report.md, deltas.json} with metric-level and
   prediction-level deltas.

Usage (one TPU chip, ~10-20 min):   python scripts_dev/exp_bf16_eval.py
CPU wiring check:                   python scripts_dev/exp_bf16_eval.py --cpu-smoke
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--members", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--dump", default="/tmp/bf16_corpus.json")
    ap.add_argument("--data-dir", default="/tmp/bf16_data")
    ap.add_argument("--save-dir", default="/tmp/bf16_ens")
    ap.add_argument("--out", default="reports/bf16_serving")
    ap.add_argument("--skip-fetch", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--cpu-smoke", action="store_true")
    args = ap.parse_args()
    if args.cpu_smoke:
        # keep smoke artifacts off the real run's paths: resume=True would
        # happily "finish" a flagship run from the smoke's 32-hidden members
        for attr in ("dump", "data_dir", "save_dir", "out"):
            setattr(args, attr, getattr(args, attr) + "_smoke")
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    n = 80 if args.cpu_smoke else args.n
    if not args.skip_fetch:
        subprocess.run([sys.executable,
                        str(REPO / "scripts_dev/make_offline_corpus.py"),
                        "--n", str(n), "--seed", str(args.seed),
                        "--out", args.dump, "--mp-real", "--hetero"],
                       check=True, cwd=REPO)
        import os
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        subprocess.run([sys.executable, "-m", "gnnep_tpu.cli.fetch",
                        "--out-dir", args.data_dir, "--from-json", args.dump,
                        "--nn-method", "knn12", "--fetch-workers", "4"],
                       check=True, cwd=REPO, env=env)

    from gnnep_tpu.train.config import TrainConfig
    from gnnep_tpu.train.ensemble import run_training

    if args.cpu_smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
        cfg = TrainConfig(data_dir=args.data_dir, save_dir=args.save_dir,
                          batch_size=8, epochs=3, ensemble_size=2, hidden=32,
                          layers=1, heads=2, verbose=True)
    else:
        cfg = TrainConfig(data_dir=args.data_dir, save_dir=args.save_dir,
                          batch_size=64, epochs=args.epochs,
                          ensemble_size=args.members,
                          hidden=256, layers=4, heads=4,
                          conv_impl="fused", compute_dtype="bfloat16",
                          scan_steps=8, pack_workers=4, verbose=True,
                          member_isolation="process", resume=True)
    if not args.skip_train:
        run_training(cfg)

    # --- metric-level deltas: the full evaluate pipeline, twice ----------
    from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation

    metrics = {}
    for dt in ("float32", "bfloat16"):
        metrics[dt] = run_evaluation(EvalConfig(
            ensemble_dir=args.save_dir, data_dir=args.data_dir,
            output_dir=str(out_dir / f"eval_{dt}"), eval_split="test",
            ensemble_size=cfg.ensemble_size, batch_size=cfg.batch_size,
            make_plots=False, compute_dtype=dt))

    # --- prediction-level deltas: per-member raw forward outputs ---------
    from gnnep_tpu.data.batching import BatchBudget, epoch_batches
    from gnnep_tpu.data.splits import derive_splits
    from gnnep_tpu.data.store import GraphStore
    from gnnep_tpu.infer.predict import Ensemble
    from gnnep_tpu.parallel.train_step import collect_predictions_auto
    from gnnep_tpu.train.loop import oneshot_config, reconcile_win64

    ens = Ensemble.load(args.save_dir)
    store = GraphStore.load_dir(args.data_dir)
    _, _, _, test_idx, _ = derive_splits(store.group_keys(), cfg.seed,
                                         cfg.val_frac, cfg.calib_frac,
                                         cfg.test_frac, cfg.ensemble_size)
    std_store = ens.scaler.apply(store)
    budget = BatchBudget.plan(std_store, range(std_store.n_graphs),
                              cfg.batch_size)
    batches = epoch_batches(std_store, list(test_idx), budget, shuffle=False)
    dz_max = dz_mean = dls_max = dls_mean = 0.0
    rel_lin = []
    for params, mc in zip(ens.members, ens.cfgs):
        mc = reconcile_win64(mc, budget)
        m32, s32, _, _ = collect_predictions_auto(
            oneshot_config(mc), cfg.min_logvar_floor, params, batches)
        m16, s16, _, _ = collect_predictions_auto(
            oneshot_config(mc), cfg.min_logvar_floor, params, batches,
            compute_dtype="bfloat16")
        dz = np.abs(m16 - m32)
        dls = np.abs(np.log(s16) - np.log(s32))
        dz_max = max(dz_max, float(dz.max()))
        dz_mean += float(dz.mean()) / len(ens.members)
        dls_max = max(dls_max, float(dls.max()))
        dls_mean += float(dls.mean()) / len(ens.members)
        # z-space μ delta → relative linear-space prediction delta
        lin32 = ens.transformer.inverse(m32)
        lin16 = ens.transformer.inverse(m16)
        rel_lin.append(np.abs(lin16 - lin32) / np.maximum(np.abs(lin32), 1e-9))
    rel_lin = np.concatenate(rel_lin)

    keys = ("mae", "rmse", "r2", "spearman_err_sigma", "coverage_90",
            "ece", "nll")

    def grab(md):
        flat = {}
        for k, v in md.items():
            if isinstance(v, (int, float)):
                flat[k] = v
            elif isinstance(v, dict):
                for kk, vv in v.items():
                    if isinstance(vv, (int, float)):
                        flat[f"{k}.{kk}"] = vv
        return {k: v for k, v in flat.items()
                if any(t in k.lower() for t in keys)}

    report = {
        "n_test": int(len(test_idx)),
        "arch": {"hidden": cfg.hidden, "layers": cfg.layers,
                 "heads": cfg.heads, "members": cfg.ensemble_size},
        "prediction_deltas": {
            "mu_z_abs_max": dz_max, "mu_z_abs_mean": dz_mean,
            "log_sigma_abs_max": dls_max, "log_sigma_abs_mean": dls_mean,
            "mu_linear_rel_max": float(rel_lin.max()),
            "mu_linear_rel_mean": float(rel_lin.mean()),
            "mu_linear_rel_p99": float(np.quantile(rel_lin, 0.99)),
        },
        "metrics_float32": grab(metrics["float32"]),
        "metrics_bfloat16": grab(metrics["bfloat16"]),
    }
    (out_dir / "deltas.json").write_text(json.dumps(report, indent=2))

    lines = ["# bf16 serving rung: accuracy cost on a trained flagship model",
             "",
             f"Corpus: {n} offline-MP entries (mp-real + hetero noise), "
             f"test split n={report['n_test']}; ensemble "
             f"{cfg.ensemble_size}× ({cfg.hidden}/{cfg.layers}/{cfg.heads}), "
             f"trained bf16 (the flagship recipe).", "",
             "## Prediction-level deltas (bf16 vs f32 forward, same params)",
             ""]
    pd = report["prediction_deltas"]
    lines += [f"- z-space μ: mean |Δ| {pd['mu_z_abs_mean']:.2e}, "
              f"max {pd['mu_z_abs_max']:.2e}",
              f"- log σ: mean |Δ| {pd['log_sigma_abs_mean']:.2e}, "
              f"max {pd['log_sigma_abs_max']:.2e}",
              f"- linear-space μ relative: mean "
              f"{pd['mu_linear_rel_mean']:.2%}, p99 "
              f"{pd['mu_linear_rel_p99']:.2%}, max "
              f"{pd['mu_linear_rel_max']:.2%}", "",
              "## Metric-level deltas (full evaluate pipeline)", "",
              "| metric | float32 | bfloat16 |", "|---|---|---|"]
    for k in sorted(set(report["metrics_float32"]) |
                    set(report["metrics_bfloat16"])):
        a = report["metrics_float32"].get(k, float("nan"))
        b = report["metrics_bfloat16"].get(k, float("nan"))
        lines.append(f"| {k} | {a:.4f} | {b:.4f} |")
    (out_dir / "report.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
