"""Dev: dump the compiled scan-step HLO for fusion-level inspection."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gnnep_tpu.data.batching import measure_seg_win64, measure_win64
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.loop import (TrainHyper, make_scan_train_step,
                                  sigma_mask)
from gnnep_tpu.utils.synth import flagship_config, synthetic_batch


def _r32(x):
    return ((x + 31) // 32) * 32


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
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
    stacked = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (K,) + np.asarray(x).shape
                                  ).copy(), batch)
    step, init_opt = make_scan_train_step(cfg, hyper, np.array([4.32, 3.56]),
                                          np.array([0.91, 0.94]))
    opt_state = init_opt(params)
    smask = sigma_mask(params)
    lowered = jax.jit(step).lower(params, opt_state, smask, stacked,
                                  jax.random.PRNGKey(1), 3e-4, 3e-4)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)} chars")


if __name__ == "__main__":
    main()
