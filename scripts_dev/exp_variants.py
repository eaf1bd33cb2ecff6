"""Dev: timed step variants in one TPU process (batch sizes, bwd block size)."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gnnep_tpu.data.batching import measure_win64
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import TrainHyper, make_scan_train_step, sigma_mask
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def run(n_graphs, K=8, iters=6, label=""):
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, n_graphs=n_graphs, mean_atoms=10, degree=10)
    cfg = dataclasses.replace(
        flagship_config(), conv_impl="fused",
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])))
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch)
    stacked = jax.device_put(stacked, jax.devices()[0])
    step, init_opt = make_scan_train_step(cfg, hyper, np.array([4.32, 3.56]),
                                          np.array([0.91, 0.94]))
    opt_state = init_opt(params)
    smask = sigma_mask(params)
    k = jax.random.PRNGKey(1)
    p, o, m = step(params, opt_state, smask, stacked, k, 3e-4, 3e-4)
    p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
    jax.block_until_ready(m.loss_sum)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, smask, stacked, k, 3e-4, 3e-4)
    float(np.asarray(m.loss_sum)[-1])
    ms = (time.perf_counter() - t0) / (iters * K) * 1e3
    lg_e = int(np.sum(np.asarray(batch.lg_mask)))
    e = int(np.sum(np.asarray(batch.edge_mask)))
    eps = (lg_e + e) / (ms / 1e3)
    print(f"[{label}] graphs={n_graphs} step={ms:.2f} ms "
          f"edges/s={eps/1e6:.2f}M (lg={lg_e} e={e})")


def main():
    run(64, label="b64 default")
    run(128, label="b128")
    run(256, label="b256")

    # force bwd bn=128 on the eproj kernels (VMEM may overflow — report)
    from gnnep_tpu.ops.pallas import csr_attention as mod
    orig = mod.pick_block_n_attn_ep_bwd

    def forced(n, e_total, max_deg, hidden, fe, preferred=128, win64=0,
               itemsize=4):
        r = orig(n, e_total, max_deg, hidden, fe, preferred, win64, itemsize)
        return 128 if (r is not None and n % 128 == 0) else r

    mod.pick_block_n_attn_ep_bwd = forced
    try:
        run(64, label="b64 bwd-bn128")
    except Exception as ex:
        print("bwd-bn128 failed:", type(ex).__name__, str(ex)[:300])
    finally:
        mod.pick_block_n_attn_ep_bwd = orig


if __name__ == "__main__":
    main()
