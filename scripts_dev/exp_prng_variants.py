"""Dev: A/B the dropout mask-generation strategies on the flagship step.

Monkeypatches `jax.random.bernoulli` (every dropout site routes through it)
inside ONE TPU process:
  - baseline: rbg bernoulli (1 u32 -> uniform f32 -> compare, per element)
  - byte: 4 keep decisions per u32 (uint8 lanes vs threshold)
  - const: mask generation removed entirely (upper bound on PRNG savings;
    keeps the apply/select/scale structure)
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
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import TrainHyper, make_scan_train_step, sigma_mask
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

_orig_bernoulli = jax.random.bernoulli


def byte_bernoulli(key, p=0.5, shape=None):
    n = int(np.prod(shape))
    nw = (n + 3) // 4
    bits = jax.random.bits(key, (nw,), dtype=jnp.uint32)
    b = jnp.stack([bits & 0xFF, (bits >> 8) & 0xFF,
                   (bits >> 16) & 0xFF, (bits >> 24) & 0xFF],
                  axis=-1).reshape(-1)[:n]
    t = jnp.round(jnp.asarray(p, jnp.float32) * 256.0).astype(jnp.uint32)
    return (b < t).reshape(shape)


def const_bernoulli(key, p=0.5, shape=None):
    return jnp.ones(shape, jnp.bool_)


def time_step(label):
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)

    def _r32(x):
        return ((x + 31) // 32) * 32

    cfg = dataclasses.replace(
        flagship_config(), conv_impl="fused",
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])))
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
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


def main():
    base = time_step("baseline bernoulli")
    jax.random.bernoulli = byte_bernoulli
    try:
        byte = time_step("byte-packed bernoulli")
    finally:
        jax.random.bernoulli = _orig_bernoulli
    jax.random.bernoulli = const_bernoulli
    try:
        const = time_step("const mask (no PRNG)")
    finally:
        jax.random.bernoulli = _orig_bernoulli
    print(f"byte saves {base - byte:.3f} ms; ceiling {base - const:.3f} ms")


if __name__ == "__main__":
    main()
