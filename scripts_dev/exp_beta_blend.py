"""Dev A/B: split-GEMV beta_blend vs the reference concat formulation.

Same-process, interleaved repeats, scalar-readback sync (PERF.md
measurement discipline). Toggles the formulation by monkeypatching
`ops.graph_attention.beta_blend` before each trace.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.data.batching import measure_seg_win64, measure_win64
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.ops import dense_attention, graph_attention
from gnnep_tpu.train.loop import (TrainHyper, make_scan_train_step,
                                  sigma_mask)
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def concat_blend(w_beta, r, msg):
    beta = jax.nn.sigmoid(jnp.concatenate([r, msg, r - msg], axis=-1)
                          @ w_beta)
    return beta * r + (1.0 - beta) * msg


def main():
    K = 8
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=64, mean_atoms=10, degree=10)
    cfg = dataclasses.replace(
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
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    smask = sigma_mask(params)
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch)
    stacked = jax.device_put(stacked, jax.devices()[0])
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])

    def build(label, blend):
        dense_attention.beta_blend = blend
        graph_attention.beta_blend = blend
        # distinct hyper (log_sigma_l2 tweak would change numerics; instead
        # bust the memo with a unique jitter value at the 1e-12 level)
        h = dataclasses.replace(hyper, feature_jitter_std=0.1
                                + (1e-12 if label == "concat" else 0.0))
        step, init_opt = make_scan_train_step(cfg, h, mu, sd)
        return step, init_opt

    variants = {}
    for label, blend in (("split", graph_attention.beta_blend),
                         ("concat", concat_blend)):
        step, init_opt = build(label, blend)
        # real copies: jnp.asarray of a device array aliases the buffer and
        # the step donates args — the second variant would see deleted arrays
        p = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
        o = init_opt(p)
        k = jax.random.PRNGKey(1)
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
        jax.block_until_ready(m.loss_sum)
        variants[label] = (step, p, o)

    times = {"split": [], "concat": []}
    k = jax.random.PRNGKey(2)
    for rep in range(4):
        for label in ("split", "concat"):
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
