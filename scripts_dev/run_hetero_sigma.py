"""σ-quality demonstration run on the heteroscedastic offline corpus.

VERDICT r2 item 7: on the i.i.d.-noise corpus, Spearman(|err|, σ) ≈ 0 *by
construction*, so the σ-quality machinery (heteroscedastic heads, the
ECE/coverage/Spearman tie-break cascade, KNN density weighting) had never
been shown to do anything useful end-to-end. The `--hetero` corpus gives
each entry a structure-visible noise level (prototype family + ionicity +
metal fraction), so a good σ head CAN rank its errors.

This driver:
1. trains an ensemble on `data/hetero_corpus` WITH KNN density weighting
   (verbose logs capture the [Weights] activation lines),
2. evaluates the test split (metrics.json carries Spearman(|err|, σ)),
3. correlates the predicted σ against the GENERATOR's per-entry noise truth
   (`noise_sigma_k/g` in the dump) — the strongest available check that the
   σ head learned the real uncertainty structure,
4. parses the member logs to show the best-epoch tie-break cascade actually
   changing selections vs plain argmin-MAE,
5. writes everything to reports/sigma_hetero/.

Usage (one TPU chip, ~15-30 min):
    python scripts_dev/run_hetero_sigma.py \
        --dump /tmp/hetero_corpus.json --data-dir data/hetero_corpus
"""
from __future__ import annotations

import argparse
import io
import json
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / d) if d > 0 else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/hetero_corpus.json")
    ap.add_argument("--data-dir", default="data/hetero_corpus")
    ap.add_argument("--save-dir", default="artifacts/hetero_ens")
    ap.add_argument("--out", default="reports/sigma_hetero")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny CPU run to validate the driver wiring")
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    from gnnep_tpu.train.config import TrainConfig
    from gnnep_tpu.train.ensemble import run_training

    if args.cpu_smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
        cfg = TrainConfig(
            data_dir=args.data_dir, save_dir=args.save_dir,
            batch_size=8, epochs=10, ensemble_size=2, hidden=32, layers=1,
            heads=2, enable_density_weighting=True, weight_warmup_epochs=2,
            knn_refresh=3, knn_k=5, verbose=True)
    else:
        cfg = TrainConfig(
            data_dir=args.data_dir, save_dir=args.save_dir,
            batch_size=64, epochs=args.epochs, ensemble_size=args.members,
            hidden=args.hidden, layers=args.layers, heads=4,
            conv_impl="fused", compute_dtype="bfloat16", scan_steps=0,
            enable_density_weighting=True, weight_warmup_epochs=8,
            knn_refresh=5, pack_workers=4, verbose=True)
        # NOTE scan_steps=0: KNN refresh snapshots interleave with training,
        # and the per-epoch logs feed the tie-break analysis below

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with redirect_stdout(Tee()):
        run_training(cfg)
    log = buf.getvalue()
    (out_dir / "train_log.txt").write_text(log)

    # --- KNN weighting evidence -------------------------------------------
    weight_lines = [ln for ln in log.splitlines() if "[Weights]" in ln]
    knn_active = any("KNN weights for" in ln for ln in weight_lines)

    # --- tie-break cascade evidence ---------------------------------------
    # per-member: epoch selected by the cascade vs plain argmin val_mae
    members = {}
    pat = re.compile(r"\[Member (\d+)\] Epoch (\d+) .*val_mae=([0-9.]+|nan)")
    best_pat = re.compile(r"\[Member (\d+)\] Best epoch (\d+)")
    for ln in log.splitlines():
        m = pat.search(ln)
        if m:
            members.setdefault(m.group(1), {}).setdefault(
                "epochs", []).append((int(m.group(2)), float(m.group(3))))
        b = best_pat.search(ln)
        if b:
            members.setdefault(b.group(1), {})["best"] = int(b.group(2))
    tie_break = []
    for seed, d in members.items():
        if "epochs" not in d or "best" not in d:
            continue
        ep, mae = zip(*d["epochs"])
        argmin = ep[int(np.nanargmin(mae))]
        tie_break.append({"member": seed, "selected_epoch": d["best"],
                          "argmin_mae_epoch": argmin,
                          "cascade_changed_selection": d["best"] != argmin})

    # --- evaluation + σ-vs-truth ------------------------------------------
    from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation

    metrics = run_evaluation(EvalConfig(
        ensemble_dir=args.save_dir, data_dir=args.data_dir,
        output_dir=str(out_dir / "eval"), eval_split="test",
        ensemble_size=cfg.ensemble_size, batch_size=cfg.batch_size,
        make_plots=not args.cpu_smoke))

    # per-sample predicted σ vs the generator's noise law
    from gnnep_tpu.data.batching import BatchBudget, epoch_batches, verify_win64
    from gnnep_tpu.data.splits import derive_splits
    from gnnep_tpu.data.store import GraphStore
    from gnnep_tpu.infer.predict import Ensemble
    from gnnep_tpu.parallel.train_step import collect_predictions_auto
    from gnnep_tpu.train.loop import (MIN_LOGVAR_FLOOR, oneshot_config,
                                      reconcile_win64)

    ens = Ensemble.load(args.save_dir)
    store = GraphStore.load_dir(args.data_dir)
    std_store = ens.scaler.apply(store)
    tr, vl, cal, te, _ = derive_splits(store.group_keys(), cfg.seed,
                                       cfg.val_frac, cfg.calib_frac,
                                       cfg.test_frac, cfg.ensemble_size)
    budget = BatchBudget.plan(std_store, range(std_store.n_graphs),
                              cfg.batch_size)
    batches = epoch_batches(std_store, te, budget, shuffle=False)
    sig_m, mu_m = [], []
    order = None
    for params, mc in zip(ens.members, ens.cfgs):
        mc = reconcile_win64(mc, budget)
        verify_win64(batches, mc)
        mean_z, sigma_z, y, idx = collect_predictions_auto(
            oneshot_config(mc), MIN_LOGVAR_FLOOR, params, batches)
        mu_m.append(mean_z)
        sig_m.append(sigma_z)
        order = idx
    mu = np.mean(mu_m, axis=0)
    var = (np.asarray(sig_m) ** 2).mean(0) + (np.asarray(mu_m) ** 2).mean(0) - mu ** 2
    sigma_pred = np.sqrt(np.clip(var, 1e-12, None))  # z-space mixture σ

    dump = json.loads(Path(args.dump).read_text())
    entries = dump.get("materials", dump)
    truth = {e["material_id"]: (e.get("noise_sigma_k"), e.get("noise_sigma_g"))
             for e in entries}
    ids = [store.material_ids[i] for i in order]
    tk = np.array([truth.get(m, (np.nan, np.nan))[0] for m in ids], float)
    tg = np.array([truth.get(m, (np.nan, np.nan))[1] for m in ids], float)
    ok = np.isfinite(tk) & np.isfinite(tg)
    analysis = {
        "n_test": int(ok.sum()),
        "knn_weighting_activated": knn_active,
        "knn_log_lines": weight_lines[:10],
        "tie_break": tie_break,
        "spearman_err_sigma_overall":
            metrics["overall"]["spearman_error_uncertainty"],
        "spearman_err_sigma_per_target": {
            t: metrics["per_target"][t]["spearman_error_uncertainty"]
            for t in metrics["per_target"]},
        # σ head vs generator truth (z-space σ should rank with σ_ln truth)
        "spearman_sigma_vs_truth_K": spearman(sigma_pred[ok, 0], tk[ok]),
        "spearman_sigma_vs_truth_G": spearman(sigma_pred[ok, 1], tg[ok]),
    }
    (out_dir / "sigma_analysis.json").write_text(
        json.dumps(analysis, indent=2, default=float))
    print(json.dumps({k: v for k, v in analysis.items()
                      if not isinstance(v, list)}, indent=2, default=float))
    print(f"report -> {out_dir}")


if __name__ == "__main__":
    main()
