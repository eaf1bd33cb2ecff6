"""Dev: trace the boundary scan step (Mesh((1,1))) and aggregate device op
costs — the attribution behind the boundary-vs-aligned gap (VERDICT r4
item 4a). Reuses agg_trace.py's bucketing on the written trace dir."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.random as jrandom
import numpy as np

from bench import _flagship_batch_and_cfg
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.parallel.boundary_shard import (build_boundary_tables,
                                               plan_boundary)
from gnnep_tpu.parallel.mesh import make_mesh
from gnnep_tpu.parallel.train_step import (make_boundary_scan_step,
                                           stack_boundary_for_mesh,
                                           stack_boundary_tables)
from gnnep_tpu.train.loop import TrainHyper, sigma_mask


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnnep_prof_bdry"
    scan_k = 8
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    cfg, batch = _flagship_batch_and_cfg(64, "fused", rng_seed=0)
    bb, plan = plan_boundary(batch, 1)
    tables, meta = build_boundary_tables(bb, plan)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    dev = jax.devices()[0]
    one = stack_boundary_for_mesh([bb], 1)
    stacked_tb = jax.device_put(stack_boundary_tables(tables), dev)
    scan_bb = jax.device_put(jax.tree.map(
        lambda x: np.stack([np.asarray(x)] * scan_k), one), dev)
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])
    multi, init_opt = make_boundary_scan_step(mesh, cfg, hyper, mu, sd,
                                              plan, meta=meta)
    params = init_alignn(jrandom.PRNGKey(0), cfg)
    smask = sigma_mask(params)
    opt = init_opt(params)

    def call(params, opt):
        out = multi(params, opt, scan_bb, stacked_tb, jrandom.PRNGKey(1),
                    3e-4, 3e-4, smask)
        return out[0], out[1], out[2]

    for _ in range(2):
        params, opt, loss = call(params, opt)
    float(np.asarray(loss).sum())
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        params, opt, loss = call(params, opt)
    float(np.asarray(loss).sum())
    print(f"boundary scan step: "
          f"{(time.perf_counter() - t0) / (n * scan_k) * 1e3:.2f} ms/step")
    with jax.profiler.trace(out_dir):
        params, opt, loss = call(params, opt)
        float(np.asarray(loss).sum())
    print("trace written to", out_dir)


if __name__ == "__main__":
    main()
