"""Dev: bound the 'everything else' costs of the flagship step.

Variants timed in ONE TPU process (PERF.md discipline: chained steps,
scalar readback):
  - baseline train step (dropout 0.15, jitter 0.1)
  - no-dropout / no-jitter train step (bounds PRNG + mask-apply cost)
  - forward-only NLL eval (bounds the backward's share)
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gnnep_tpu.data.batching import measure_win64
from gnnep_tpu.models.alignn import alignn_apply, init_alignn
from gnnep_tpu.train.loop import TrainHyper, make_scan_train_step, sigma_mask
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def setup(drop=None):
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)
    cfg = dataclasses.replace(
        flagship_config(), conv_impl="fused",
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])))
    if drop is not None:
        cfg = dataclasses.replace(cfg, dropout=drop)
    return cfg, batch


def time_train(label, drop, jitter):
    cfg, batch = setup(drop)
    hyper = TrainHyper(feature_jitter_std=jitter, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    K = 8
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch)
    stacked = jax.device_put(stacked, jax.devices()[0])
    step, init_opt = make_scan_train_step(cfg, hyper, np.array([4.32, 3.56]),
                                          np.array([0.91, 0.94]))
    o = init_opt(params)
    smask = sigma_mask(params)
    k = jax.random.PRNGKey(1)
    p, o, m = step(params, o, smask, stacked, k, 3e-4, 3e-4)
    p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
    float(np.asarray(m.loss_sum)[-1])
    ms = (time.perf_counter() - t0) / (iters * K) * 1e3
    print(f"[{label}] step={ms:.3f} ms")
    return ms


def time_fwd(label):
    cfg, batch = setup()
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    bdev = jax.device_put(batch, jax.devices()[0])

    @jax.jit
    def fwd(p, b):
        mean, logvar = alignn_apply(p, cfg, b, train=False)
        return jnp.sum(mean) + jnp.sum(logvar)

    out = fwd(params, bdev)
    float(np.asarray(out))
    t0 = time.perf_counter()
    iters = 40
    for _ in range(iters):
        out = fwd(params, bdev)
    float(np.asarray(out))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[{label}] fwd={ms:.3f} ms (per-dispatch, no scan)")
    return ms


def main():
    base = time_train("baseline d0.15 j0.1", None, 0.1)
    nod = time_train("no-dropout no-jitter", 0.0, 0.0)
    time_fwd("forward-only eval")
    print(f"PRNG+mask bound: {base - nod:.3f} ms/step")


if __name__ == "__main__":
    main()
