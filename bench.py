"""Benchmark: ALIGNN fwd+bwd throughput in edges/s/chip (the north-star
metric, BASELINE.json). Runs the full jitted training step (hetero NLL,
AdamW, flagship architecture: hidden 256, 4 layers, 4 heads) on synthetic
batches with Materials-Project-like graph statistics.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _vs_baseline(value: float, key: str = "edges_per_sec_per_chip"):
    """(ratio, note): ratio of `value` to BASELINE.json's published number
    for `key` when one exists. The reference publishes NO throughput numbers
    (SURVEY.md §6 — `published` is `{}`), so absent a baseline the ratio is
    1.0 BY DEFINITION and the note says so explicitly — it must not read
    like a measured comparison."""
    try:
        import pathlib

        base = json.loads((pathlib.Path(__file__).resolve().parent
                           / "BASELINE.json").read_text())
        published = base.get("published") or {}
        ref = published.get(key)
        if ref:
            return round(value / float(ref), 4), f"vs published {key}={ref}"
    except Exception:
        pass
    return 1.0, ("definitional: BASELINE.json publishes no throughput "
                 "baseline (published={})")


def _conv_layer_bytes(n, e, cap, heads, hidden, fe, item=2):
    """Per-layer HBM stream bytes of one fused-eproj conv (fwd+bwd).

    The documented inventory behind the bench's roofline `hbm_gbps_modeled`
    (families and magnitudes cross-checked against the round-5 trace
    attribution, PERF.md). Coarse by design — window reads are counted at
    full cap (the ~12 % dilution amplification), RMW margins at 128 rows.
    """
    f32 = 4
    n_blocks = max(n // 64, 1)
    win = n_blocks * cap * (2 * hidden + fe) * item      # kv+ea windows
    strips = n_blocks * cap * (heads + 2) * f32          # scale/mask strips
    return (
        n * hidden * item + n * 4 * hidden * item        # proj read+write
        + n * 2 * hidden * item + e * 2 * hidden * item  # kv gather
        + win + strips + n * hidden * item               # fwd windows + q
        + n * (hidden + 256) * f32                       # msg + stats out
        + win + strips                                   # bwd windows
        + n * (2 * hidden + 256) * f32                   # q/g/stats reads
        + n_blocks * cap * (2 * hidden + fe) * item      # dkv+dea writeback
        + n_blocks * 128 * (2 * hidden + fe) * item      # RMW margin reads
        + n * hidden * item                              # dq out
        + e * (2 * hidden + fe) * item                   # dkv/dea zero-init
        + 2 * e * 2 * hidden * item                      # dkv permute
        + n_blocks * cap * 2 * hidden * item             # dkv segsum windows
        + n * 2 * hidden * f32                           # dkv segsum out
        + 14 * n * hidden * item                         # epilogue passes
    )


def _modeled_step_bytes(cfg, batch) -> float:
    """Analytic per-step HBM bytes of the flagship fused training step."""
    np_, ep, lp, g = batch.capacity
    h = cfg.hidden
    item = 2  # bf16 compute
    lg = _conv_layer_bytes(ep, lp, cfg.lg_win64 + 128, cfg.heads, h, h, item)
    atom = _conv_layer_bytes(np_, ep, cfg.edge_win64 + 128, cfg.heads, h, h,
                             item)
    # encoders (angle encoder dominates: [Lp, 11→H] + activations, ×3 for
    # fwd + grads), pooling/heads/globals (graph-space, small), optimizer
    # (~7 f32 passes over the parameter set)
    enc = 3 * (lp + ep + np_) * h * item
    n_params = (4 * h * h * 4 + 3 * h * h + h * h) * cfg.layers * 2
    opt = 7 * n_params * 4
    return float(cfg.layers * (lg + atom) + enc + opt)


def _kernel_flops(cfg, batch) -> float:
    """Analytic MXU FLOPs inside the Pallas custom calls per training step
    (XLA's cost model cannot see them): per conv layer, the in-window edge
    projection (fwd + bwd recompute + dea + dW), the per-head SDDMM /
    aggregation rectangles (5 rectangle contractions in bwd), and the
    windowed dkv segment-sum's 0/1 matmul."""
    np_, ep, lp, g = batch.capacity
    h = cfg.hidden
    ch = h // cfg.heads

    def conv(n, e, cap):
        n_blocks = max(n // 64, 1)
        eproj = 2 * cap * h * h          # one [cap,Fe]@[Fe,H]
        rect = 2 * 64 * ch * cap         # one [64,ch]·[cap,ch] rectangle
        fwd = n_blocks * (eproj + cfg.heads * 2 * rect)
        bwd = n_blocks * (3 * eproj + cfg.heads * 5 * rect)
        segsum = n_blocks * 2 * 64 * cap * 2 * h
        return fwd + bwd + segsum

    return float(cfg.layers * (conv(ep, lp, cfg.lg_win64 + 128)
                               + conv(np_, ep, cfg.edge_win64 + 128)))


def _flagship_batch_and_cfg(n_graphs: int, conv_impl: str, rng_seed: int = 42):
    """Flagship config + one synthetic batch with its measured win64 bounds."""
    import dataclasses

    import numpy as np

    from gnnep_tpu.data.batching import measure_seg_win64, measure_win64
    from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

    cfg = dataclasses.replace(flagship_config(), conv_impl=conv_impl)
    # size overrides (the --functional CI smoke shrinks the model so bench
    # wiring is exercised on CPU in seconds)
    for env, field in (("BENCH_HIDDEN", "hidden"), ("BENCH_LAYERS", "layers"),
                       ("BENCH_HEADS", "heads")):
        if os.environ.get(env):
            cfg = dataclasses.replace(cfg, **{field: int(os.environ[env])})
    batch = synthetic_batch(np.random.default_rng(rng_seed),
                            n_graphs=n_graphs, mean_atoms=10, degree=10)

    def _r32(x):
        return ((x + 31) // 32) * 32

    cfg = dataclasses.replace(
        cfg,
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])),
        edge_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.edge_src_starts), batch.edge_src.shape[0])),
        lg_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.lg_src_starts), batch.lg_src.shape[0])))
    return cfg, batch


def scaling_mode(n_devices: int):
    """Multi-chip scaling harness on the graph-aligned production path:
    edges/s on a (data × edge) mesh vs one device, reporting scaling
    efficiency (north-star target ≥ 85 %). Each device slot consumes a
    complete fused-kernel sub-batch; the only collective is the per-step
    gradient psum, so efficiency measures the all-reduce cost alone.

    On a pod slice run under `jax.distributed`; on a dev box use
    JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count for a
    functional (not performance) check.
    """
    import os
    import time

    import jax

    # a site hook may pre-register the single-chip TPU plugin AND override
    # JAX_PLATFORMS — honor a CPU request via jax.config too (the same
    # recipe as tests/conftest.py and __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.random as jrandom

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.parallel.mesh import make_mesh
    from gnnep_tpu.parallel.train_step import (make_aligned_train_step,
                                               stack_for_mesh)
    from gnnep_tpu.train.loop import TrainHyper, sigma_mask

    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    conv_impl = "fused" if on_tpu else "table"
    n_graphs = 64 if on_tpu else 8
    iters = 10 if on_tpu else 2
    hyper = TrainHyper(compute_dtype="bfloat16" if on_tpu else "float32")
    rng = np.random.default_rng(0)

    def run(n_dev: int) -> float:
        n_edge = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
        n_data = n_dev // n_edge
        mesh = make_mesh(n_data, n_edge, devices=jax.devices()[:n_dev])
        cfg, proto = _flagship_batch_and_cfg(n_graphs, conv_impl)
        if not on_tpu:  # functional check only: shrink the model
            cfg = dataclasses.replace(cfg, hidden=64, layers=2, heads=2)
        batches = [proto._replace(
            nodes=rng.normal(size=proto.nodes.shape).astype(np.float32),
            edge_attr=rng.normal(size=proto.edge_attr.shape).astype(np.float32))
            for _ in range(n_dev)]
        edges = sum(float(np.asarray(b.edge_mask).sum()
                          + np.asarray(b.lg_mask).sum()) for b in batches)
        step, init_opt = make_aligned_train_step(
            mesh, cfg, hyper, np.array([4.32, 3.56]), np.array([0.91, 0.94]))
        params = init_alignn(jrandom.PRNGKey(0), cfg)
        opt = init_opt(params)
        smask = sigma_mask(params)
        stacked = stack_for_mesh(batches, n_dev)
        params, opt, loss, _ = step(params, opt, stacked, jrandom.PRNGKey(1),
                                    3e-4, 3e-4, smask)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt, loss, _ = step(params, opt, stacked,
                                        jrandom.PRNGKey(1), 3e-4, 3e-4, smask)
        float(loss)
        return edges * iters / (time.perf_counter() - t0)

    base = run(1)
    scaled = run(n_devices)
    eff = scaled / (base * n_devices)
    print(json.dumps({
        "metric": "edges_per_sec_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"fraction (1->{n_devices} devices)",
        "vs_baseline": round(eff / 0.85, 4),
        "detail": {"edges_per_sec_1dev": round(base, 1),
                   "edges_per_sec_ndev": round(scaled, 1),
                   "formulation": "graph-aligned", "conv_impl": conv_impl},
    }))


def sharded_parity_mode():
    """VERDICT r1 done-criterion: on the real chip, the 1-device
    Mesh((1,1)) graph-aligned sharded step must be within ~15 % of the
    unsharded fused step (it runs the identical fused-kernel program plus a
    1-participant psum). Both sides run as scan-over-K-steps programs so
    the measurement is device time, not the dispatch tunnel (PERF.md
    measurement discipline)."""
    import time

    import jax
    import jax.random as jrandom

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.parallel.mesh import make_mesh
    from gnnep_tpu.parallel.train_step import (make_aligned_scan_step,
                                               stack_for_mesh)
    from gnnep_tpu.train.loop import (TrainHyper, make_scan_train_step,
                                      prng_key, sigma_mask)

    on_tpu = jax.default_backend() == "tpu"
    conv_impl = "fused" if on_tpu else "table"
    cfg, batch = _flagship_batch_and_cfg(64 if on_tpu else 8, conv_impl,
                                         rng_seed=0)
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16" if on_tpu else "float32")
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])
    smask = None
    scan_k = 30 if on_tpu else 2
    n_disp = 3 if on_tpu else 1
    dev = jax.devices()[0]

    def bcast(x, extra=()):  # [K, ...] stacked copies, materialized
        return np.broadcast_to(np.asarray(x),
                               (scan_k,) + tuple(extra)
                               + np.asarray(x).shape).copy()

    def time_program(run, params, opt_state):
        key = prng_key(1, "rbg")
        state = (params, opt_state)
        for _ in range(2):  # compile + donated-aliasing recompile
            key, k = jax.random.split(key)
            state = run(state, k)
        jax.block_until_ready(state[0])
        t0 = time.perf_counter()
        for _ in range(n_disp):
            key, k = jax.random.split(key)
            state = run(state, k)
        jax.block_until_ready(state[0])
        return (time.perf_counter() - t0) / (n_disp * scan_k) * 1e3

    # unsharded fused scan program
    params = init_alignn(jrandom.PRNGKey(0), cfg)
    smask = sigma_mask(params)
    multi_u, init_u = make_scan_train_step(cfg, hyper, mu, sd)
    stacked_u = jax.device_put(jax.tree.map(bcast, batch), dev)

    def run_u(state, k):
        p, o, _ = multi_u(state[0], state[1], smask, stacked_u, k, 3e-4, 3e-4)
        return p, o

    ms_unsharded = time_program(run_u, params, init_u(params))

    # Mesh((1,1)) aligned sharded scan program on the same batch
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    multi_s, init_s = make_aligned_scan_step(mesh, cfg, hyper, mu, sd)
    one = stack_for_mesh([batch], 1)
    stacked_s = jax.device_put(
        jax.tree.map(lambda x: bcast(x[0], extra=(1,)), one), dev)

    def run_s(state, k):
        p, o, _, _ = multi_s(state[0], state[1], stacked_s, k, 3e-4, 3e-4,
                             smask)
        return p, o

    params = init_alignn(jrandom.PRNGKey(0), cfg)
    ms_sharded = time_program(run_s, params, init_s(params))

    overhead = ms_sharded / ms_unsharded - 1.0
    print(json.dumps({
        "metric": "aligned_sharded_step_overhead_1dev",
        "value": round(overhead, 4),
        "unit": "fraction vs unsharded fused step",
        "vs_baseline": round(0.15 / max(overhead, 1e-4), 2),
        "detail": {"ms_unsharded": round(ms_unsharded, 3),
                   "ms_sharded_1x1": round(ms_sharded, 3),
                   "conv_impl": conv_impl, "scan_steps": scan_k},
    }))


def main():
    import jax

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
    from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

    dev = jax.devices()[0]
    import dataclasses

    conv_impl = os.environ.get("BENCH_IMPL", "fused")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype=dtype,
                       flat_opt=os.environ.get("BENCH_FLAT", "0") == "1")
    n_graphs = int(os.environ.get("BENCH_GRAPHS", 64))
    # batch with seed 0 + measured per-64-target window bounds (smaller
    # VMEM windows in the fused kernels)
    cfg, batch = _flagship_batch_and_cfg(n_graphs, conv_impl, rng_seed=0)
    edges_per_step = float(np.asarray(batch.edge_mask).sum()
                           + np.asarray(batch.lg_mask).sum())
    batch = jax.device_put(batch, dev)

    params = init_alignn(jax.random.PRNGKey(0), cfg)
    # rbg is the training default (BENCH_PRNG=threefry2x32 to override)
    from gnnep_tpu.train.loop import prng_key
    key = prng_key(1, os.environ.get("BENCH_PRNG", "rbg"))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    # scan mode (default): lax.scan over K steps inside one jitted program —
    # the host leaves the inner loop, so the number measures the chip, not
    # the dispatch tunnel. BENCH_SCAN=0 reverts to per-step host dispatch.
    scan_k = int(os.environ.get("BENCH_SCAN", 30))
    if scan_k > 0:
        from gnnep_tpu.train.loop import make_scan_train_step

        multi, init_opt = make_scan_train_step(cfg, hyper,
                                               np.array([4.32, 3.56]),
                                               np.array([0.91, 0.94]))
        opt_state = init_opt(params)
        smask = sigma_mask(params)
        # .copy() materializes contiguous host arrays: device_put of a
        # stride-0 broadcast view re-uploads through the tunnel on every call
        stacked = jax.device_put(
            jax.tree.map(lambda x: np.broadcast_to(
                np.asarray(x), (scan_k,) + np.asarray(x).shape).copy(),
                batch), dev)
        # TWO warmup dispatches: the first compiles, the second recompiles
        # for the donated-buffer aliasing pattern of steady-state calls
        for _ in range(2):
            key, k = jax.random.split(key)
            params, opt_state, ms = multi(params, opt_state, smask, stacked,
                                          k, 3e-4, 3e-4)
        jax.block_until_ready(ms.loss_sum)
        n_disp = max(-(-iters // scan_k), 2)
        # best-of-N repeats in ONE invocation: single-launch numbers on the
        # tunneled runtime carry ±5 % noise (PERF.md round-3 study) — the
        # recorded metric de-noises itself instead of crying regression
        repeat_dts = []
        for _ in range(int(os.environ.get("BENCH_REPEATS", 3))):
            t0 = time.perf_counter()
            for _ in range(n_disp):
                key, k = jax.random.split(key)
                params, opt_state, ms = multi(params, opt_state, smask,
                                              stacked, k, 3e-4, 3e-4)
            jax.block_until_ready(ms.loss_sum)
            repeat_dts.append(time.perf_counter() - t0)
        dt = min(repeat_dts)
        n_steps = n_disp * scan_k
    else:
        step, init_opt = make_train_step(cfg, hyper,
                                         np.array([4.32, 3.56]),
                                         np.array([0.91, 0.94]))
        opt_state = init_opt(params)
        smask = sigma_mask(params)
        for _ in range(3):
            key, k = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, smask, batch, k,
                                        3e-4, 3e-4)
        jax.block_until_ready(m.loss_sum)
        repeat_dts = []
        for _ in range(int(os.environ.get("BENCH_REPEATS", 3))):
            t0 = time.perf_counter()
            for _ in range(iters):
                key, k = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, smask, batch,
                                            k, 3e-4, 3e-4)
            jax.block_until_ready(m.loss_sum)
            repeat_dts.append(time.perf_counter() - t0)
        dt = min(repeat_dts)
        n_steps = iters

    step_ms = dt / n_steps * 1e3
    edges_per_sec = edges_per_step * n_steps / dt
    repeat_ms = [round(d / n_steps * 1e3, 3) for d in repeat_dts]
    spread = (max(repeat_ms) - min(repeat_ms)) / min(repeat_ms)
    vsb, vsb_note = _vs_baseline(edges_per_sec)

    # Roofline position (VERDICT r4 item 7): achieved HBM GB/s and MXU
    # FLOP/s for the measured step against hardware ceilings, so future
    # regressions are judged against limits rather than history. FLOPs =
    # XLA's count of the scan body (counted once per step; verified
    # K-invariant) + the analytic inventory of the Pallas kernels' MXU
    # contractions (XLA cannot see custom-call interiors). Bytes = the
    # documented stream inventory of _modeled_step_bytes (XLA's "bytes
    # accessed" sums full logical buffers per instruction — it implies
    # >1 TB/s here and is unusable as a utilization basis). Ceilings:
    # v5e HBM 819 GB/s spec (~680 measured on plain XLA streams, PERF.md
    # round 5) and 197 TFLOP/s bf16 MXU peak.
    roofline = {}
    try:
        # NB: `multi`/`step` are already jitted — lower them directly so the
        # compile options (incl. donation) match the timed call and the
        # compile resolves from cache instead of building a second program
        if scan_k > 0:
            ca = (multi
                  .lower(params, opt_state, smask, stacked, key, 3e-4, 3e-4)
                  .compile().cost_analysis())
        else:
            ca = (step
                  .lower(params, opt_state, smask, batch, key, 3e-4, 3e-4)
                  .compile().cost_analysis())
        step_s = step_ms / 1e3
        kflops = _kernel_flops(cfg, batch)
        flops = ca["flops"] + kflops
        gbytes = _modeled_step_bytes(cfg, batch) / 1e9
        gbps = gbytes / step_s
        tflops = flops / step_s / 1e12
        roofline = {
            "hbm_gbps_modeled": round(gbps, 1),
            "mxu_tflops": round(tflops, 2),
            "hbm_utilization_vs_819": round(gbps / 819.0, 3),
            "mxu_utilization_vs_197tf": round(tflops / 197.0, 4),
            "flops_xla": float(ca["flops"]),
            "flops_kernels_analytic": float(kflops),
            "bytes_modeled": round(gbytes, 3),
            "roofline_basis": ("bytes: analytic stream inventory; flops: "
                               "XLA scan body + in-kernel contractions"),
        }
    except Exception as exc:  # noqa: BLE001 — roofline is best-effort
        roofline = {"roofline_error": f"{type(exc).__name__}: {exc}"[:120]}
    print(json.dumps({
        "metric": "alignn_train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s/chip",
        "vs_baseline": vsb,
        "detail": {
            "vs_baseline_basis": vsb_note,
            "device": str(dev),
            "step_ms": round(step_ms, 3),
            "repeat_step_ms": repeat_ms,
            "repeat_spread": round(spread, 4),
            "edges_per_step": int(edges_per_step),
            "graphs_per_batch": n_graphs,
            "hidden": cfg.hidden, "layers": cfg.layers, "heads": cfg.heads,
            "conv_impl": conv_impl, "compute_dtype": dtype,
            "edge_win64": cfg.edge_win64, "lg_win64": cfg.lg_win64,
            "edge_src_win64": cfg.edge_src_win64,
            "lg_src_win64": cfg.lg_src_win64,
            "scan_steps": scan_k,
            **roofline,
        },
    }))


def edge_sharded_mode():
    """All-reduce fallback bench: the general edge-sharded training step on
    a Mesh((1,1)) single chip, COO formulation vs the scatter-free windowed
    formulation (`table_widths=measure_table_widths(...)`). NOTE: the
    recommended giant-graph path is now the boundary-exchange formulation
    (`--boundary`, 6.02 M edges/s/chip vs 1.91 M here); this mode records
    the no-pack-time-planning fallback. Steps dispatch asynchronously with
    donated buffers and only the final loss is read back (PERF.md
    measurement discipline)."""
    import jax
    import jax.random as jrandom

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.parallel.mesh import make_mesh
    from gnnep_tpu.parallel.train_step import (make_sharded_train_step,
                                               measure_table_widths,
                                               stack_for_mesh)
    from gnnep_tpu.train.loop import TrainHyper, sigma_mask

    on_tpu = jax.default_backend() == "tpu"
    n_graphs = int(os.environ.get("BENCH_GRAPHS", 64 if on_tpu else 4))
    iters = int(os.environ.get("BENCH_ITERS", 20 if on_tpu else 2))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16" if on_tpu else "float32")
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype=dtype)
    cfg, batch = _flagship_batch_and_cfg(n_graphs, "coo", rng_seed=0)
    if not on_tpu:
        import dataclasses
        cfg = dataclasses.replace(cfg, hidden=64, layers=2, heads=2)
    widths = measure_table_widths([batch])
    edges_per_step = float(np.asarray(batch.edge_mask).sum()
                           + np.asarray(batch.lg_mask).sum())
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    # materialize ON DEVICE: a host-resident pytree re-uploads the whole
    # batch through the ~0.45 GB/s tunnel on every dispatch (PERF.md)
    stacked = jax.device_put(stack_for_mesh([batch], 1), jax.devices()[0])
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])

    def run(table_widths, impl):
        step, init_opt = make_sharded_train_step(mesh, cfg, hyper, mu, sd,
                                                 table_widths=table_widths,
                                                 impl=impl)
        params = init_alignn(jrandom.PRNGKey(0), cfg)
        smask = sigma_mask(params)
        opt = init_opt(params)
        for _ in range(2):  # compile + donated-aliasing recompile
            params, opt, loss, _ = step(params, opt, stacked,
                                        jrandom.PRNGKey(1), 3e-4, 3e-4, smask)
        float(np.asarray(loss))
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt, loss, _ = step(params, opt, stacked,
                                        jrandom.PRNGKey(1), 3e-4, 3e-4, smask)
        float(np.asarray(loss))
        return edges_per_step * iters / (time.perf_counter() - t0)

    # interleaved best-of-2 per formulation: the tunneled runtime shows
    # 30-40 % run-to-run swings (PERF.md measurement discipline)
    eps_coo = run(None, None)
    eps_win = run(widths, "windowed")
    eps_coo = max(eps_coo, run(None, None))
    eps_win = max(eps_win, run(widths, "windowed"))
    print(json.dumps({
        "metric": "edge_sharded_train_edges_per_sec_per_chip",
        "value": round(eps_win, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(eps_win / max(eps_coo, 1e-9), 3),
        "detail": {
            "formulation": "windowed (scatter-free, 2-D layouts)",
            "edges_per_sec_coo": round(eps_coo, 1),
            "speedup_vs_coo": round(eps_win / max(eps_coo, 1e-9), 3),
            "table_widths": list(widths),
            "edges_per_step": int(edges_per_step),
            "graphs_per_batch": n_graphs, "compute_dtype": dtype,
            "hidden": cfg.hidden, "layers": cfg.layers, "heads": cfg.heads,
        },
    }))


def boundary_mode():
    """Boundary-exchange edge partitioning bench (VERDICT r3 item 2): the
    giant-graph path re-run through the fused-kernel machinery. Because the
    boundary formulation's softmax is rank-local, each rank executes the
    SAME dense-table/Pallas conv path as the single-chip production step —
    so its per-chip rate at Mesh((1,1)) is the measure of 'the fallback with
    in-kernel softmax'. Reports fused-boundary vs COO-boundary vs the
    all-reduce windowed formulation's recorded rate."""
    import jax
    import jax.random as jrandom

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.parallel.boundary_shard import (build_boundary_tables,
                                                   plan_boundary)
    from gnnep_tpu.parallel.mesh import make_mesh
    from gnnep_tpu.parallel.train_step import (make_boundary_scan_step,
                                               make_boundary_train_step,
                                               stack_boundary_for_mesh,
                                               stack_boundary_tables)
    from gnnep_tpu.train.loop import TrainHyper, sigma_mask

    on_tpu = jax.default_backend() == "tpu"
    n_graphs = int(os.environ.get("BENCH_GRAPHS", 64 if on_tpu else 4))
    # ≥6 timed dispatches of the scan program: at 2 dispatches the
    # per-dispatch tunnel overhead depressed the recorded rate ~15 %
    # (5.50 vs 6.6-6.7 M measured round 5)
    iters = int(os.environ.get("BENCH_ITERS", 60 if on_tpu else 2))
    scan_k = int(os.environ.get("BENCH_SCAN", 10 if on_tpu else 0))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16" if on_tpu else "float32")
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype=dtype)
    impl = "fused" if on_tpu else "table"
    cfg, batch = _flagship_batch_and_cfg(n_graphs, impl, rng_seed=0)
    if not on_tpu:
        import dataclasses
        cfg = dataclasses.replace(cfg, hidden=64, layers=2, heads=2)
    edges_per_step = float(np.asarray(batch.edge_mask).sum()
                           + np.asarray(batch.lg_mask).sum())
    bb, plan = plan_boundary(batch, 1)
    tables, meta = build_boundary_tables(bb, plan)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    dev = jax.devices()[0]
    one = stack_boundary_for_mesh([bb], 1)
    stacked_bb = jax.device_put(one, dev)
    stacked_tb = jax.device_put(stack_boundary_tables(tables), dev)
    mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])
    scan_bb = None
    if scan_k > 1:
        scan_bb = jax.device_put(jax.tree.map(
            lambda x: np.stack([np.asarray(x)] * scan_k), one), dev)

    def run(use_tables, scan=False):
        if scan:
            multi, init_opt = make_boundary_scan_step(
                mesh, cfg, hyper, mu, sd, plan,
                meta=meta if use_tables else None)
        else:
            multi, init_opt = make_boundary_train_step(
                mesh, cfg, hyper, mu, sd, plan,
                meta=meta if use_tables else None)
        params = init_alignn(jrandom.PRNGKey(0), cfg)
        smask = sigma_mask(params)
        opt = init_opt(params)
        data = scan_bb if scan else stacked_bb

        def call(params, opt):
            args = ((data, stacked_tb) if use_tables else (data,))
            out = multi(params, opt, *args, jrandom.PRNGKey(1), 3e-4, 3e-4,
                        smask)
            return out[0], out[1], out[2]

        for _ in range(2):  # compile + donated-aliasing recompile
            params, opt, loss = call(params, opt)
        float(np.asarray(loss).sum())
        n_disp = max(iters // (scan_k if scan else 1), 2)
        t0 = time.perf_counter()
        for _ in range(n_disp):
            params, opt, loss = call(params, opt)
        float(np.asarray(loss).sum())
        steps = n_disp * (scan_k if scan else 1)
        return edges_per_step * steps / (time.perf_counter() - t0)

    # interleaved best-of-2 (PERF.md measurement discipline); the scan
    # program measures the chip, the per-step number includes dispatch
    use_scan = scan_k > 1
    eps_coo = run(False)
    eps_fused = run(True, scan=use_scan)
    eps_coo = max(eps_coo, run(False))
    eps_fused = max(eps_fused, run(True, scan=use_scan))
    eps_step = run(True) if use_scan else eps_fused
    print(json.dumps({
        "metric": "boundary_sharded_train_edges_per_sec_per_chip",
        "value": round(eps_fused, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(eps_fused / max(eps_coo, 1e-9), 3),
        "detail": {
            "formulation": "boundary-exchange, rank-local fused kernels",
            "edges_per_sec_coo_boundary": round(eps_coo, 1),
            "edges_per_sec_per_step_dispatch": round(eps_step, 1),
            "scan_steps": scan_k,
            "edges_per_step": int(edges_per_step),
            "graphs_per_batch": n_graphs, "compute_dtype": dtype,
            "conv_impl": impl,
            "hidden": cfg.hidden, "layers": cfg.layers, "heads": cfg.heads,
            "win64": {"a": meta.a_win64, "a_src": meta.a_src_win64,
                      "l": meta.l_win64, "l_src": meta.l_src_win64},
            "comm_bytes_per_conv": plan.comm_bytes_per_conv(
                cfg.hidden, projected=False),
        },
    }))


def infer_mode():
    """Serving throughput: jitted eval forward (no grad, no optimizer) of
    ONE flagship member over device-resident batches — graphs/s and
    edges/s for the inference path (the programs behind evaluate/predict).
    Chained dispatches, scalar readback. Measures every serving rung:
    f32/bf16 (`--compute-dtype`) x per-batch/`make_scan_forward`
    (the scan-amortized collector); the headline is the fastest rung and
    `detail.rungs` carries all four."""
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    from gnnep_tpu.models.alignn import init_alignn
    from gnnep_tpu.train.loop import (make_forward, make_scan_forward,
                                      oneshot_config)

    on_tpu = jax.default_backend() == "tpu"
    conv_impl = "fused" if on_tpu else "table"
    n_graphs = int(os.environ.get("BENCH_GRAPHS", 64 if on_tpu else 8))
    iters = int(os.environ.get("BENCH_ITERS", 60 if on_tpu else 3))
    stack_s = int(os.environ.get("BENCH_STACK", 16 if on_tpu else 2))
    cfg, batch = _flagship_batch_and_cfg(n_graphs, conv_impl, rng_seed=0)
    if not on_tpu:
        import dataclasses
        cfg = dataclasses.replace(cfg, hidden=64, layers=2, heads=2)
    edges = float(np.asarray(batch.edge_mask).sum()
                  + np.asarray(batch.lg_mask).sum())
    graphs = float(np.asarray(batch.graph_mask).sum())
    dev = jax.devices()[0]
    batch = jax.device_put(batch, dev)
    stacked = jax.device_put(
        jax.tree.map(lambda x: np.stack([np.asarray(x)] * stack_s), batch),
        dev)
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    scfg = oneshot_config(cfg)  # scan_layers, exactly as evaluate/predict do

    # chain iterations on device: each forward perturbs its own input from
    # the previous mean, so XLA cannot elide or overlap the calls, and one
    # scalar readback syncs the full chain (block_until_ready under-syncs
    # on this runtime — PERF.md measurement discipline)
    def time_rung(base, use_stack):
        def fwd(seed):
            if use_stack:
                b = stacked._replace(nodes=stacked.nodes + 1e-6 * seed)
                mean, logvar = base(params, b)
                return mean[-1, 0, 0]
            b = batch._replace(nodes=batch.nodes + 1e-6 * seed)
            mean, logvar = base(params, b)
            return mean[0, 0]
        float(np.asarray(fwd(jnp.float32(0))))   # compile + warm
        n = max(1, iters // stack_s) if use_stack else iters
        t0 = time.perf_counter()
        seed = jnp.float32(0)
        for _ in range(n):
            seed = fwd(seed)
        float(np.asarray(seed))
        dt = time.perf_counter() - t0
        batches_done = n * (stack_s if use_stack else 1)
        return dt / batches_done * 1e3          # ms per batch

    rungs = {}
    for dtype in ("float32", "bfloat16"):
        rungs[f"{dtype}_per_batch"] = time_rung(
            make_forward(scfg, -2.9, dtype), use_stack=False)
        rungs[f"{dtype}_scan{stack_s}"] = time_rung(
            make_scan_forward(scfg, -2.9, dtype), use_stack=True)
    best_name = min(rungs, key=rungs.get)
    ms = rungs[best_name]
    vsb, vsb_note = _vs_baseline(graphs / ms * 1e3,
                                 key="infer_graphs_per_sec_per_chip")
    print(json.dumps({
        "metric": "alignn_infer_graphs_per_sec_per_chip",
        "value": round(graphs / ms * 1e3, 1),
        "unit": "graphs/s/chip",
        "vs_baseline": vsb,
        "detail": {"vs_baseline_basis": vsb_note, "best_rung": best_name,
                   "edges_per_sec": round(edges / ms * 1e3, 1),
                   "ms_per_batch": round(ms, 3),
                   "rungs_ms_per_batch": {k: round(v, 3)
                                          for k, v in rungs.items()},
                   "graphs_per_batch": int(graphs),
                   "conv_impl": conv_impl, "hidden": cfg.hidden,
                   "layers": cfg.layers, "heads": cfg.heads},
    }))


def functional_mode():
    """CI smoke: run the full bench path on a tiny model/batch (CPU-safe) so
    the wiring can't rot between hardware runs. Same code path as main()."""
    defaults = {"BENCH_GRAPHS": "2", "BENCH_ITERS": "2", "BENCH_SCAN": "2",
                "BENCH_HIDDEN": "32", "BENCH_LAYERS": "2", "BENCH_HEADS": "2",
                "BENCH_DTYPE": "float32", "BENCH_IMPL": "table"}
    for k, v in defaults.items():
        os.environ.setdefault(k, v)
    # honor a CPU request even when a site hook pre-registered the TPU
    # plugin (same recipe as scaling_mode / tests/conftest.py) — the CI
    # smoke must never grab the shared chip
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()


if __name__ == "__main__":
    import sys

    from gnnep_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # compiles excluded from timings; saves wall-clock

    if "--scaling" in sys.argv:
        idx = sys.argv.index("--scaling")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 8
        scaling_mode(n)
    elif "--sharded-parity" in sys.argv:
        sharded_parity_mode()
    elif "--edge-sharded" in sys.argv:
        edge_sharded_mode()
    elif "--boundary" in sys.argv:
        boundary_mode()
    elif "--infer" in sys.argv:
        infer_mode()
    elif "--functional" in sys.argv:
        functional_mode()
    else:
        main()
