"""Subprocess entry for one ensemble member (member_isolation='process').

The tunneled TPU client leaks every host→device transfer's host mirror
(PERF.md round 4 — ~1.8 GB per flagship epoch, unbounded over a long
ensemble run). Training each member in its own process caps the leak at one
member's lifetime; the persistent XLA compile cache makes the per-process
re-warm cheap. The member computed here is IDENTICAL to the in-process
path: both derive (seed, fold, subset, config) from `ensemble.member_plan`
and the deterministic `prepare(cfg)` setup.

Invoked by `ensemble.run_training`; also runnable by hand:
    python -m gnnep_tpu.train.member_proc <cfg.json> <member_index>
"""
from __future__ import annotations

import json
import sys
from pathlib import Path


def main(cfg_path: str, index: str) -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from .artifacts import save_member
    from .config import TrainConfig
    from .ensemble import compute_freq_weights, member_plan, prepare
    from .member import train_member

    cfg = TrainConfig(**json.loads(Path(cfg_path).read_text()))
    i = int(index)
    setup = prepare(cfg)
    freq_weights = compute_freq_weights(cfg, setup)
    seed_i, fold_idx, train_i, holdout, mc, member_cfg = member_plan(
        cfg, setup, i)
    if cfg.verbose:
        print(f"[member_proc {i}] seed={seed_i} fold={fold_idx + 1}/"
              f"{len(setup.folds)} train={len(train_i)} "
              f"fold_val={len(holdout)}")
    params, _ = train_member(setup.store, member_cfg, mc, setup.transformer,
                             setup.budget, seed_i, train_i, holdout,
                             freq_weights=freq_weights, giant=setup.giant)
    save_member(Path(cfg.save_dir) / f"model_{i}.npz", params, mc)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit("usage: python -m gnnep_tpu.train.member_proc "
                         "<cfg.json> <member_index>")
    main(sys.argv[1], sys.argv[2])
