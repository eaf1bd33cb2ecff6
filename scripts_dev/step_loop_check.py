"""Isolate: fixed-key vs split-key full-step timing (bench.py uses split)."""
import dataclasses
import time

import jax
import numpy as np

from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch
from gnnep_tpu.data.batching import measure_win64


def _r32(x):
    return ((x + 31) // 32) * 32


def main():
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
    batch = jax.device_put(batch, jax.devices()[0])
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    step, init_opt = make_train_step(cfg, hyper, np.array([4.32, 3.56]),
                                     np.array([0.91, 0.94]))
    opt_state = init_opt(params)
    smask = sigma_mask(params)

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)

    t0 = time.perf_counter()
    for _ in range(30):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    print("split-key step ms:", (time.perf_counter() - t0) / 30 * 1e3)

    kfix = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    for _ in range(30):
        params, opt_state, m = step(params, opt_state, smask, batch, kfix,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    print("fixed-key step ms:", (time.perf_counter() - t0) / 30 * 1e3)

    t0 = time.perf_counter()
    for _ in range(30):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    print("split-key again ms:", (time.perf_counter() - t0) / 30 * 1e3)

    t0 = time.perf_counter()
    for _ in range(30):
        params, opt_state, m = step(params, opt_state, smask, batch, kfix,
                                    3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    print("fixed-key again ms:", (time.perf_counter() - t0) / 30 * 1e3)

    # scalar readback sync (verify-skill style)
    t0 = time.perf_counter()
    for _ in range(30):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, smask, batch, k,
                                    3e-4, 3e-4)
    _ = float(np.asarray(m.loss_sum))
    print("split-key scalar-readback ms:",
          (time.perf_counter() - t0) / 30 * 1e3)


if __name__ == "__main__":
    main()
