"""Dev bisect: where does the 16 ms step go? (TPU, scalar-readback timing)"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.models.alignn import init_alignn, alignn_apply
from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch
from gnnep_tpu.data.batching import measure_win64


def _r32(x):
    return ((x + 31) // 32) * 32


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


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
    k = jax.random.PRNGKey(1)

    # build the bf16 copy BEFORE the donating step loop eats `params`
    p16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    # step donates params/opt_state — thread them through the timing loop
    p_cur, o_cur, m = step(params, opt_state, smask, batch, k, 3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    t0 = time.perf_counter()
    for _ in range(30):
        p_cur, o_cur, m = step(p_cur, o_cur, smask, batch, k, 3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    print("full step ms:", (time.perf_counter() - t0) / 30 * 1e3)

    # forward only (no dropout/jitter ~ eval forward)
    @jax.jit
    def fwd(p):
        m, lv = alignn_apply(p, cfg, batch)
        return m.sum() + lv.sum()

    print("fwd only ms:", timeit(fwd, p16))

    @jax.jit
    def fwdbwd(p):
        def loss(pp):
            m, lv = alignn_apply(pp, cfg, batch)
            return (m.sum() + lv.sum()).astype(jnp.float32)
        g = jax.grad(loss)(p)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

    print("fwd+bwd (no opt) ms:", timeit(fwdbwd, p16))

    # single-layer config: isolate one (edge conv + node conv) pair
    cfg1 = dataclasses.replace(cfg, layers=1)
    params1 = init_alignn(jax.random.PRNGKey(0), cfg1)
    p161 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params1)

    @jax.jit
    def fwd1(p):
        m, lv = alignn_apply(p, cfg1, batch)
        return m.sum() + lv.sum()

    print("fwd 1-layer ms:", timeit(fwd1, p161))

    @jax.jit
    def fwdbwd1(p):
        def loss(pp):
            m, lv = alignn_apply(pp, cfg1, batch)
            return (m.sum() + lv.sum()).astype(jnp.float32)
        g = jax.grad(loss)(p)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

    print("fwd+bwd 1-layer ms:", timeit(fwdbwd1, p161))


if __name__ == "__main__":
    main()
