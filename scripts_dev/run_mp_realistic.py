"""Flagship 5-member run on the MP-realistic offline corpus (VERDICT r3 #6).

Pipeline, end to end on one TPU chip:
 1. generate the MP-realistic corpus (heavy-tailed supercell sizes,
    substitutional disorder, vacancies, structure-correlated heteroscedastic
    noise WITH stored clean targets) — scripts_dev/make_offline_corpus.py
    --mp-real --hetero;
 2. featurize through the real fetch CLI (`--from-json`, knn12 neighbors);
 3. train the reference-default flagship ensemble (5 members, hidden 256,
    4 layers, 4 heads, fused kernels, bf16, scan inner loop);
 4. evaluate the test split (full metric suite + plots);
 5. compute the corpus's EXACT irreducible noise floor from the stored
    clean targets + per-entry σ (no Monte-Carlo guesswork), the predicted-σ
    vs generator-truth Spearman, and the packer's win64/dilution evidence;
 6. write reports/mp_realistic/{eval/, summary.json, train_log.txt}.

Usage:
    python scripts_dev/run_mp_realistic.py            # full TPU run
    python scripts_dev/run_mp_realistic.py --cpu-smoke
"""
from __future__ import annotations

import argparse
import io
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / d) if d > 0 else float("nan")


def noise_floor(clean: np.ndarray, sig: np.ndarray, rng) -> dict:
    """Exact irreducible metrics for observations y = clean·e^ε, ε~N(0, σ²),
    against the BEST possible predictor (the clean value itself).

    MAE uses the analytic E|e^ε − 1| = e^{σ²/2}(2Φ(σ/... )) — evaluated by
    high-count MC on shared draws (deterministic seed) for simplicity;
    RMSE/R² use the analytic second moment E(e^ε−1)² = e^{2σ²} − 2e^{σ²/2}+1.
    """
    draws = rng.standard_normal(200_000)
    # keys use the SAME rounding function on both sides: numpy's scaled
    # rounding and Python's round() can disagree in last-ulp halfway cases,
    # and a KeyError here kills the report step after a multi-hour run
    sig_keys = np.unique(np.round(sig, 4))
    mae_terms = np.array([np.abs(np.exp(s * draws) - 1.0).mean()
                          for s in sig_keys])
    lut = {float(k): v for k, v in zip(sig_keys, mae_terms)}
    e_abs = np.array([lut[float(np.round(s, 4))] for s in sig])
    mae = float((clean * e_abs).mean())
    var_terms = np.exp(2 * sig ** 2) - 2 * np.exp(sig ** 2 / 2.0) + 1.0
    mse = float((clean ** 2 * var_terms).mean())
    # R² of the clean predictor vs one noisy realization (MC, fixed seed)
    eps = rng.standard_normal(clean.shape) * sig
    obs = clean * np.exp(eps)
    ss_res = float(((obs - clean) ** 2).sum())
    ss_tot = float(((obs - obs.mean()) ** 2).sum())
    return {"mae": mae, "rmse": float(np.sqrt(mse)),
            "r2_one_draw": 1.0 - ss_res / ss_tot}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--dump", default="/tmp/mp_real_corpus.json")
    ap.add_argument("--data-dir", default="data/mp_real")
    ap.add_argument("--save-dir", default="artifacts/mp_real_ens")
    ap.add_argument("--out", default="reports/mp_realistic")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--cpu-smoke", action="store_true")
    ap.add_argument("--skip-fetch", action="store_true",
                    help="reuse an existing --data-dir")
    ap.add_argument("--member-dropouts", default=None,
                    help="comma list, one per member (diversity A/B)")
    ap.add_argument("--member-lrs", default=None,
                    help="comma list, one per member (diversity A/B)")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    n = 60 if args.cpu_smoke else args.n
    if not args.skip_fetch:
        # 1. corpus
        subprocess.run([sys.executable,
                        str(REPO / "scripts_dev/make_offline_corpus.py"),
                        "--n", str(n), "--seed", str(args.seed),
                        "--out", args.dump, "--mp-real", "--hetero"],
                       check=True, cwd=REPO)
        # 2. featurize (real fetch CLI, knn12 — the CrystalNN-grade method
        # on pymatgen-less hosts)
        import os
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        subprocess.run([sys.executable, "-m", "gnnep_tpu.cli.fetch",
                        "--out-dir", args.data_dir, "--from-json", args.dump,
                        "--nn-method", "knn12", "--fetch-workers", "4"],
                       check=True, cwd=REPO, env=env)

    # 3. flagship training
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
                          # process isolation + member-level resume: the
                          # tunneled client leaks ~1.8 GB/epoch of host
                          # transfer mirrors (PERF.md round 4) — per-member
                          # subprocesses cap it, and finished members are
                          # skipped if the run is re-invoked after a crash
                          member_isolation="process", resume=True,
                          member_dropouts=[float(x) for x in
                                           args.member_dropouts.split(",")]
                          if args.member_dropouts else None,
                          member_lrs=[float(x) for x in
                                      args.member_lrs.split(",")]
                          if args.member_lrs else None)

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    from contextlib import redirect_stdout
    with redirect_stdout(Tee()):
        run_training(cfg)
    (out_dir / "train_log.txt").write_text(buf.getvalue())

    # 4. evaluation
    from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation

    metrics = run_evaluation(EvalConfig(
        ensemble_dir=args.save_dir, data_dir=args.data_dir,
        output_dir=str(out_dir / "eval"), eval_split="test",
        ensemble_size=cfg.ensemble_size, batch_size=cfg.batch_size,
        make_plots=not args.cpu_smoke))

    # 5. exact noise floor + σ-vs-truth + packing evidence
    from gnnep_tpu.data.batching import BatchBudget
    from gnnep_tpu.data.splits import derive_splits
    from gnnep_tpu.data.store import GraphStore

    store = GraphStore.load_dir(args.data_dir)
    _, _, _, test_idx, _ = derive_splits(store.group_keys(), cfg.seed,
                                         cfg.val_frac, cfg.calib_frac,
                                         cfg.test_frac, cfg.ensemble_size)
    dump = json.loads(Path(args.dump).read_text())
    entries = {e["material_id"]: e for e in dump.get("materials", dump)}
    ids = [store.material_ids[i] for i in test_idx]
    have = [m for m in ids if m in entries
            and entries[m].get("k_clean") is not None]
    kc = np.array([entries[m]["k_clean"] for m in have])
    gc = np.array([entries[m]["g_clean"] for m in have])
    sk = np.array([entries[m]["noise_sigma_k"] for m in have])
    sg = np.array([entries[m]["noise_sigma_g"] for m in have])
    rng = np.random.default_rng(0)
    floor_k = noise_floor(kc, sk, rng)
    floor_g = noise_floor(gc, sg, rng)

    budget = BatchBudget.plan(store, range(store.n_graphs), cfg.batch_size)
    sizes = np.diff(store.node_off)
    summary = {
        "n_corpus": store.n_graphs,
        "n_test": len(have),
        "cell_sizes": {"median": float(np.median(sizes)),
                       "p95": float(np.percentile(sizes, 95)),
                       "max": int(sizes.max())},
        "test_mae": {"K": metrics["per_target"]["bulk_modulus"]["mae"],
                     "G": metrics["per_target"]["shear_modulus"]["mae"]},
        "test_rmse": {"K": metrics["per_target"]["bulk_modulus"]["rmse"],
                      "G": metrics["per_target"]["shear_modulus"]["rmse"]},
        "test_r2": {"K": metrics["per_target"]["bulk_modulus"]["r2"],
                    "G": metrics["per_target"]["shear_modulus"]["r2"]},
        "noise_floor": {"K": floor_k, "G": floor_g},
        "conformal_coverage": metrics["overall"]["conformal_coverage"],
        "spearman_err_sigma":
            metrics["overall"]["spearman_error_uncertainty"],
        "spearman_err_sigma_per_target": {
            t: metrics["per_target"][t]["spearman_error_uncertainty"]
            for t in metrics["per_target"]},
        "budget_win64": {"edge": budget.edge_win64, "lg": budget.lg_win64,
                         "edge_src": budget.edge_src_win64,
                         "lg_src": budget.lg_src_win64},
    }
    # σ head vs generator truth on the test split, from the eval artifacts
    # (mixture σ ranks against the entry's σ_ln — see run_hetero_sigma.py
    # for the batched recomputation; here the metrics.json Spearman plus the
    # floor comparison is the headline)
    (out_dir / "summary.json").write_text(
        json.dumps(summary, indent=2, default=float))
    print(json.dumps(summary, indent=2, default=float))
    print(f"report -> {out_dir}")


if __name__ == "__main__":
    main()
