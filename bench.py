"""Benchmark: ALIGNN fwd+bwd throughput in edges/s/chip (the north-star
metric, BASELINE.json). Runs the full jitted training step (hetero NLL,
AdamW, flagship architecture: hidden 256, 4 layers, 4 heads) on synthetic
batches with Materials-Project-like graph statistics.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no throughput numbers (SURVEY.md §6), so
vs_baseline is 1.0 by definition against an empty baseline.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
    from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

    dev = jax.devices()[0]
    cfg = flagship_config()
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1)
    rng = np.random.default_rng(0)
    n_graphs = int(os.environ.get("BENCH_GRAPHS", 64))
    batch = synthetic_batch(rng, n_graphs=n_graphs, mean_atoms=10, degree=10)
    edges_per_step = float(np.asarray(batch.edge_mask).sum()
                           + np.asarray(batch.lg_mask).sum())
    batch = jax.device_put(batch, dev)

    step, init_opt = make_train_step(cfg, hyper,
                                     np.array([4.32, 3.56]),
                                     np.array([0.91, 0.94]))
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt(params)
    smask = sigma_mask(params)
    key = jax.random.PRNGKey(1)

    # warmup / compile
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)

    iters = int(os.environ.get("BENCH_ITERS", 30))
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    dt = time.perf_counter() - t0

    step_ms = dt / iters * 1e3
    edges_per_sec = edges_per_step * iters / dt
    print(json.dumps({
        "metric": "alignn_train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        "vs_baseline": 1.0,
        "detail": {
            "device": str(dev),
            "step_ms": round(step_ms, 3),
            "edges_per_step": int(edges_per_step),
            "graphs_per_batch": n_graphs,
            "hidden": cfg.hidden, "layers": cfg.layers, "heads": cfg.heads,
        },
    }))


if __name__ == "__main__":
    main()
