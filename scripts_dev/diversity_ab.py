"""Dev: homogeneous-vs-heterogeneous ensemble diversity A/B report.

Compares the flagship MP-realistic run (homogeneous members,
reports/mp_realistic) against the per-member-override re-run
(--member-dropouts 0.05..0.25, --member-lrs 2e-4..4e-4,
reports/mp_realistic_div) on the reference's own diversity metrics
(Q-statistic, Kendall's W, member correlation, epistemic fraction,
ensemble gain — /root/reference/scripts/train.py:1959-2008 provides the
overrides for exactly this purpose). Writes reports/diversity_ab.md.
"""
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def load(tag):
    p = REPO / f"reports/{tag}/eval/test/metrics.json"
    m = json.loads(p.read_text())
    return m


def main():
    base = load("mp_realistic")
    div = load("mp_realistic_div")
    rows = [
        ("test MAE (K, GPa)", "per_target", "bulk_modulus", "mae"),
        ("test MAE (G, GPa)", "per_target", "shear_modulus", "mae"),
        ("test RMSE (K)", "per_target", "bulk_modulus", "rmse"),
        ("test RMSE (G)", "per_target", "shear_modulus", "rmse"),
        ("ensemble gain %", "overall", None, "ensemble_gain_percent"),
        ("epistemic fraction", "overall", None, "epistemic_fraction_mean"),
        ("Q-statistic (pairwise)", "overall", None, "q_statistic_mean"),
        ("Kendall W", "overall", None, "kendall_w"),
        ("conformal coverage", "overall", None, "conformal_coverage"),
        ("Spearman(|err|, σ)", "overall", None,
         "spearman_error_uncertainty"),
    ]

    def get(m, sec, tgt, key):
        d = m[sec] if tgt is None else m[sec][tgt]
        v = d.get(key)
        return float(v) if v is not None else float("nan")

    def mean_offdiag(m):
        c = np.asarray(m["overall"]["member_correlation_matrix"])
        n = c.shape[0]
        return float((c.sum() - n) / (n * (n - 1)))

    lines = [
        "# Ensemble-diversity A/B — homogeneous vs per-member overrides",
        "",
        "Same corpus (data/mp_real, 6,000 structures, MP-realistic size "
        "statistics + heteroscedastic noise), same seeds/splits/folds and "
        "flagship architecture. A = homogeneous members "
        "(dropout 0.15, lr 3e-4 — `reports/mp_realistic`); B = the "
        "reference's diversity levers "
        "(`--member-dropouts 0.05,0.10,0.15,0.20,0.25 "
        "--member-lrs 2e-4,2.5e-4,3e-4,3.5e-4,4e-4` — "
        "`reports/mp_realistic_div`).",
        "",
        "| metric | homogeneous | heterogeneous | Δ |",
        "|---|---|---|---|",
    ]
    for label, sec, tgt, key in rows:
        a = get(base, sec, tgt, key)
        b = get(div, sec, tgt, key)
        lines.append(f"| {label} | {a:.4f} | {b:.4f} | {b - a:+.4f} |")
    a_corr, b_corr = mean_offdiag(base), mean_offdiag(div)
    lines.append(f"| member correlation (mean off-diag) | {a_corr:.4f} | "
                 f"{b_corr:.4f} | {b_corr - a_corr:+.4f} |")
    lines.append("")
    out = REPO / "reports/diversity_ab.md"
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {out}")


if __name__ == "__main__":
    main()
