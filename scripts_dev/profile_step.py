"""Dev: trace the scan-step program and aggregate device op costs.

Writes a jax.profiler trace, then parses the .trace.json.gz directly
(no tensorboard) and prints the top ops by total device time.
"""
import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

# repo-root import WITHOUT PYTHONPATH: any PYTHONPATH value (even an empty
# directory) breaks the tunneled TPU plugin's backend registration in this
# environment — see PERF.md "Measurement discipline"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.data.batching import measure_win64
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import (TrainHyper, make_scan_train_step,
                                  make_train_step, sigma_mask)
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnnep_prof"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)
    cfg = dataclasses.replace(
        flagship_config(), conv_impl="fused",
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])))
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    params = init_alignn(jax.random.PRNGKey(0), cfg)

    # stacked [K, ...] batch (same batch repeated; contents don't matter)
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch)
    stacked = jax.device_put(stacked, jax.devices()[0])

    step, init_opt = make_scan_train_step(cfg, hyper, np.array([4.32, 3.56]),
                                          np.array([0.91, 0.94]))
    opt_state = init_opt(params)
    smask = sigma_mask(params)
    k = jax.random.PRNGKey(1)
    lrs = (3e-4, 3e-4)

    p, o, m = step(params, opt_state, smask, stacked, k, *lrs)
    p, o, m = step(p, o, smask, stacked, k, *lrs)  # donation-pattern warmup
    jax.block_until_ready(m.loss_sum)

    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        p, o, m = step(p, o, smask, stacked, k, *lrs)
    jax.block_until_ready(m.loss_sum)
    per_step = (time.perf_counter() - t0) / (N * K) * 1e3
    print(f"scan step: {per_step:.2f} ms/step")

    with jax.profiler.trace(out_dir):
        p, o, m = step(p, o, smask, stacked, k, *lrs)
        jax.block_until_ready(m.loss_sum)

    time.sleep(1)
    traces = sorted(glob.glob(out_dir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace found under", out_dir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # device-lane events only: pick pids whose process name mentions TPU/device
    pid_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device:" in n or "XLA" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    meta = {}
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
        a = ev.get("args") or {}
        src = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        if src and name not in meta:
            meta[name] = str(src)[:160]
    print(f"\ntotal device event time: {total:.2f} ms "
          f"(K={K} steps in program)\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    for name, ms in rows:
        if name in meta:
            print(f"        [{meta[name]}]")
        print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
