"""Dev A/B: span-formulation kernels vs the eproj formulation.

Same-process interleaved repeats (PERF.md measurement discipline); both
variants run the flagship scan train step, differing only in
AlignnConfig.attn_span (config-keyed → separate compiled programs).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.data.batching import (measure_seg_win64, measure_span64,
                                     measure_win64)
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import (TrainHyper, make_scan_train_step,
                                  sigma_mask)
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def main():
    K = 8
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)
    nsp, bsp = measure_span64(np.asarray(batch.node_graph),
                              np.asarray(batch.edge_dst),
                              np.asarray(batch.edge_mask), batch.y.shape[0])
    print(f"measured spans: node {nsp}, bond {bsp}")
    base = dataclasses.replace(
        flagship_config(), conv_impl="fused",
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])),
        edge_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.edge_src_starts), batch.edge_src.shape[0])),
        lg_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.lg_src_starts), batch.lg_src.shape[0])))
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    params0 = init_alignn(jax.random.PRNGKey(0), base)
    smask = sigma_mask(params0)
    stacked = jax.device_put(jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch), jax.devices()[0])
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])

    variants = {}
    for label, sp in (("eproj", False), ("span", True)):
        cfg = dataclasses.replace(base, attn_span=sp, edge_span64=nsp,
                                  lg_span64=bsp)
        step, init_opt = make_scan_train_step(cfg, hyper, mu, sd)
        p = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params0)
        o = init_opt(p)
        k = jax.random.PRNGKey(1)
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
        jax.block_until_ready(m.loss_sum)
        print(f"{label}: warm loss {float(m.loss_sum[-1]):.6f} "
              f"abs_err {float(m.abs_err_sum[-1]):.6f}")
        variants[label] = (step, p, o)

    times = {lab: [] for lab in variants}
    k = jax.random.PRNGKey(2)
    for rep in range(4):
        for label in variants:
            step, p, o = variants[label]
            t0 = time.perf_counter()
            for _ in range(5):
                p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
            jax.block_until_ready(m.loss_sum)
            dt = (time.perf_counter() - t0) / (5 * K) * 1e3
            variants[label] = (step, p, o)
            times[label].append(dt)
    for label, ts in times.items():
        print(f"{label}: best {min(ts):.3f} ms/step  all "
              f"{[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
