"""On-hardware kernel regression gate (VERDICT r1 item 10).

Interpret-mode Pallas (the CPU suite) accepts layouts that real Mosaic
rejects, so hardware-only layout regressions could hide behind it. This
module runs the fused-kernel ladder on REAL TPU hardware against the
scatter-free dense-table formulation — forward and gradients, at
lane-aligned flagship dims (hidden 256, heads 4 → ch 64) where the kernels
actually engage (`dense_attention.lane_ok`).

Driver-runnable:  GNNEP_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -q
(Skipped in the CPU suite; never run it concurrently with another TPU
process — the single chip's claim relay serializes them.)
"""
import dataclasses
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("GNNEP_TEST_TPU"),
    reason="hardware gate: set GNNEP_TEST_TPU=1 on a TPU host")

pytestmark = [pytest.mark.tpu, requires_tpu]


@pytest.fixture(scope="module")
def hw():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    from gnnep_tpu.data.batching import measure_seg_win64, measure_win64
    from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

    batch = synthetic_batch(np.random.default_rng(3), n_graphs=16,
                            mean_atoms=10, degree=10)

    def _r32(x):
        return ((x + 31) // 32) * 32

    cfg = dataclasses.replace(
        flagship_config(),
        edge_win64=_r32(measure_win64(np.asarray(batch.edge_dst),
                                      batch.nodes.shape[0])),
        lg_win64=_r32(measure_win64(np.asarray(batch.lg_dst),
                                    batch.edge_src.shape[0])),
        edge_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.edge_src_starts), batch.edge_src.shape[0])),
        lg_src_win64=_r32(measure_seg_win64(
            np.asarray(batch.lg_src_starts), batch.lg_src.shape[0])))
    params = None
    from gnnep_tpu.models.alignn import init_alignn

    params = init_alignn(jax.random.PRNGKey(0),
                         dataclasses.replace(cfg, conv_impl="fused"))
    return cfg, batch, params


@pytest.mark.parametrize("ladder", ["eproj", "attn", "logits"])
def test_fused_vs_table_forward_on_mosaic(hw, ladder):
    import jax

    from gnnep_tpu.models.alignn import alignn_apply

    cfg, batch, params = hw
    cfg_f = dataclasses.replace(cfg, conv_impl="fused",
                                attn_eproj=(ladder == "eproj"),
                                attn_fused=(ladder != "logits"))
    cfg_t = dataclasses.replace(cfg, conv_impl="table")
    mf, lf = jax.jit(lambda p, b: alignn_apply(p, cfg_f, b))(params, batch)
    mt, lt = jax.jit(lambda p, b: alignn_apply(p, cfg_t, b))(params, batch)
    # Tolerance = the bf16-MXU noise band, NOT f32 ulps: in-kernel Mosaic
    # matmuls run at default precision (bf16 passes) for f32 inputs, while
    # XLA's table path lowers f32 dots at higher effective precision.
    # Measured on this runtime (diagnostic, 2026-08): fused_f32 vs table_f32
    # 1.6 % max-rel — the same band as table_bf16 vs table_f32 (1.8 %), so
    # the kernel sits within bf16-compute numerics of the reference path.
    # (An earlier runtime version landed under rtol 2e-3; the lowering
    # changed underneath — this gate guards layouts/compile/gross numerics,
    # interpret-mode tests guard exact math.)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mt),
                               rtol=2.5e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lt),
                               rtol=2.5e-2, atol=2e-3)


def test_fused_vs_table_grads_on_mosaic(hw):
    import jax

    from gnnep_tpu.models.alignn import alignn_apply

    cfg, batch, params = hw
    cfg_f = dataclasses.replace(cfg, conv_impl="fused")
    cfg_t = dataclasses.replace(cfg, conv_impl="table")

    def loss(p, c):
        m, l = alignn_apply(p, c, batch)
        return (m ** 2).sum() + (l ** 2).sum()

    gf = jax.jit(jax.grad(lambda p: loss(p, cfg_f)))(params)
    gt = jax.jit(jax.grad(lambda p: loss(p, cfg_t)))(params)
    ref_scale = max(float(np.abs(np.asarray(x)).max())
                    for x in jax.tree.leaves(gt))
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
        # PERF.md: hardware kernels agree with the table VJP to ~1e-3
        # relative; compare against the global gradient scale so sign-
        # unstable near-zero leaves don't fail spuriously
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3 * ref_scale)


def test_bf16_fused_step_finite_on_mosaic(hw):
    """The production configuration (fused + bf16 + win64 bounds) takes one
    real optimizer step with finite loss and gradients."""
    import jax

    from gnnep_tpu.train.loop import (TrainHyper, make_train_step, prng_key,
                                      sigma_mask)

    cfg, batch, params = hw
    cfg_f = dataclasses.replace(cfg, conv_impl="fused")
    hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1,
                       compute_dtype="bfloat16")
    step, init_opt = make_train_step(cfg_f, hyper, np.array([4.32, 3.56]),
                                     np.array([0.91, 0.94]))
    smask = sigma_mask(params)
    # the step donates (params, opt_state); keep the module fixture alive
    import jax.numpy as jnp
    params = jax.tree.map(jnp.array, params)
    p, o, m = step(params, init_opt(params), smask, batch, prng_key(1, "rbg"),
                   3e-4, 3e-4)
    assert np.isfinite(float(m.loss_sum))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p))


def test_edge_sharded_windowed_vs_coo_on_mosaic(hw):
    """The giant-graph fallback's windowed formulation (csr_segment_sum +
    csr_gather local reductions) must compile under real Mosaic and agree
    with the COO formulation on a Mesh((1,1)) sharded forward."""
    import jax

    from gnnep_tpu.parallel.mesh import make_mesh
    from gnnep_tpu.parallel.train_step import (make_sharded_forward,
                                               measure_table_widths,
                                               stack_for_mesh)

    cfg, batch, params = hw
    widths = measure_table_widths([batch])
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    stacked = jax.device_put(stack_for_mesh([batch], 1), jax.devices()[0])
    fwd_w = make_sharded_forward(mesh, cfg, floor=-2.9, table_widths=widths)
    fwd_c = make_sharded_forward(mesh, cfg, floor=-2.9)
    mw, lw = fwd_w(params, stacked)
    mc, lc = fwd_c(params, stacked)
    # bf16-MXU band: the windowed path's segment sums run on the Mosaic MXU
    # at default precision (see the forward test's tolerance note)
    np.testing.assert_allclose(np.asarray(mw), np.asarray(mc),
                               rtol=2.5e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lw), np.asarray(lc),
                               rtol=2.5e-2, atol=2e-3)


def test_span_formulation_matches_eproj_on_mosaic(hw):
    """The span rung's one-hot gather must be EXACT on real Mosaic: forward
    bitwise vs the eproj path (the f32 gather runs Precision.HIGHEST —
    default TPU f32 matmuls decompose to bf16 passes, a hardware-only
    divergence interpret mode cannot catch; PERF.md round 5)."""
    import jax
    import jax.numpy as jnp

    from gnnep_tpu.data.batching import measure_span64
    from gnnep_tpu.ops.pallas.csr_attention import (fused_attention_eproj,
                                                    fused_attention_span)

    cfg, batch, params = hw
    rng = np.random.default_rng(0)
    ep = batch.edge_src.shape[0]
    lp = batch.lg_src.shape[0]
    h, heads = 256, 4
    _, bsp = measure_span64(np.asarray(batch.node_graph),
                            np.asarray(batch.edge_dst),
                            np.asarray(batch.edge_mask), batch.y.shape[0])
    kvn = jnp.asarray(rng.normal(size=(ep, 2 * h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(ep, h)).astype(np.float32))
    ea = jnp.asarray(rng.normal(size=(lp, h)).astype(np.float32))
    we = jnp.asarray(rng.normal(size=(h, h)).astype(np.float32) * 0.05)
    row_ptr = jnp.asarray(batch.lg_row_ptr)
    src = jnp.asarray(batch.lg_src)
    span_lo = jnp.asarray(batch.bond_span_lo)
    kw = dict(heads=heads, max_in_degree=batch.lg_in_edges.shape[1],
              mask_e=jnp.asarray(batch.lg_mask), win64=cfg.lg_win64)

    def f_ep(q, kvn, ea, we):
        out = fused_attention_eproj(q, kvn[src], ea, we, row_ptr,
                                    jnp.asarray(batch.lg_dst), **kw)
        return jnp.sum(out[:ep - 1] ** 2)

    def f_sp(q, kvn, ea, we):
        out = fused_attention_span(q, kvn, ea, we, row_ptr, src, span_lo,
                                   span=min(bsp, ep), **kw)
        return jnp.sum(out[:ep - 1] ** 2)

    out_ep = fused_attention_eproj(q, kvn[src], ea, we, row_ptr,
                                   jnp.asarray(batch.lg_dst), **kw)
    out_sp = fused_attention_span(q, kvn, ea, we, row_ptr, src, span_lo,
                                  span=min(bsp, ep), **kw)
    np.testing.assert_array_equal(np.asarray(out_ep)[:ep - 1],
                                  np.asarray(out_sp)[:ep - 1])
    g_ep = jax.grad(f_ep, argnums=(0, 1, 2, 3))(q, kvn, ea, we)
    g_sp = jax.grad(f_sp, argnums=(0, 1, 2, 3))(q, kvn, ea, we)
    for name, a, b in zip(("dq", "dkvn", "dea", "dwe"), g_ep, g_sp):
        scale = max(float(np.abs(np.asarray(a)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-6,
                                   err_msg=name)


def test_bundle_roundtrip_on_mosaic(hw, tmp_path):
    """jax.export serializes the fused forward — Mosaic custom calls and
    all — and the rehydrated program is bit-equal to the live jit on real
    hardware (the AOT serving bundle's core contract, infer/bundle.py)."""
    import dataclasses

    import jax
    from jax import export as jexport

    from gnnep_tpu.infer.bundle import _register_serializations
    from gnnep_tpu.train.loop import make_forward, oneshot_config

    cfg, batch, params = hw
    fcfg = oneshot_config(dataclasses.replace(cfg, conv_impl="fused"))
    _register_serializations()
    fwd = make_forward(fcfg, -2.9, "bfloat16")
    blob = jexport.export(fwd)(params, batch).serialize()
    (tmp_path / "forward.bin").write_bytes(blob)

    rehydrated = jexport.deserialize((tmp_path / "forward.bin").read_bytes())
    got = rehydrated.call(params, jax.device_put(batch))
    ref = fwd(params, jax.device_put(batch))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
