"""Boundary-exchange edge partitioning: parity + comm-volume properties.

VERDICT r3 item 1 done-criteria: (a) gradient parity vs the all-reduce
formulation (and vs the single-device ground truth) on the virtual 8-device
mesh, (b) comm-bytes/conv ∝ boundary size instead of O(N·H), (c) the driver
dryrun exercises it (см. __graft_entry__.dryrun_multichip).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gnnep_tpu.data.batching import epoch_batches
from gnnep_tpu.models.alignn import alignn_apply, init_alignn
from gnnep_tpu.parallel.boundary_shard import (plan_boundary,
                                               plan_boundary_batches)
from gnnep_tpu.parallel.mesh import DATA_AXIS, EDGE_AXIS, make_mesh, shard_map
from gnnep_tpu.parallel.train_step import (batch_pspecs,
                                           make_boundary_forward,
                                           make_boundary_grads,
                                           make_boundary_train_step,
                                           stack_boundary_for_mesh,
                                           stack_for_mesh)
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare
from gnnep_tpu.train.loop import TrainHyper, sigma_mask

from synthetic import make_store

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(n=12, batch_size=6):
    store = make_store(n, seed=7)
    cfg = TrainConfig(batch_size=batch_size, hidden=16, layers=2, heads=2,
                      ensemble_size=2, verbose=False, feature_jitter_std=0.0)
    setup = prepare(cfg, store)
    mc = model_config(cfg, setup.store)
    return store, cfg, setup, mc


class TestPlan:
    def test_partition_covers_all_real_edges(self):
        store, cfg, setup, mc = _setup()
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        bb, plan = plan_boundary(b, 4)
        # every real edge appears exactly once across rank windows
        assert float(bb.a_mask.sum()) == float(np.asarray(b.edge_mask).sum())
        assert float(bb.l_mask.sum()) == float(np.asarray(b.lg_mask).sum())
        # real dst rows stay inside the owner's window; padding rows point
        # at the local arena's reserved dummy (or keep a real forward-filled
        # dst on diluted interiors)
        areal = np.asarray(bb.a_mask) > 0
        lreal = np.asarray(bb.l_mask) > 0
        assert (bb.a_dst[areal] >= 0).all() and (bb.a_dst[areal] < plan.rn).all()
        assert (bb.l_dst[lreal] >= 0).all() and (bb.l_dst[lreal] < plan.e_loc).all()
        assert ((bb.a_dst < plan.rn) | (bb.a_dst == plan.a_arena - 1)).all()
        assert ((bb.l_dst < plan.e_loc) | (bb.l_dst == plan.l_arena - 1)).all()
        # src slots address the combined (own ‖ recv ‖ dummy) arena
        assert (bb.a_src_slot < plan.a_arena).all()
        assert (bb.l_src_slot < plan.l_arena).all()
        # masked rows source the dummy state row
        assert (bb.a_src_slot[~areal] == plan.a_arena - 1).all()
        assert (bb.l_src_slot[~lreal] == plan.l_arena - 1).all()

    def test_boundary_counts_match_independent_measurement(self):
        store, cfg, setup, mc = _setup(n=16, batch_size=8)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        for S in (2, 4, 8):
            bb, plan = plan_boundary(b, S)
            rn = np.asarray(b.nodes).shape[0] // S
            src = np.asarray(b.edge_src, np.int64)
            dst = np.asarray(b.edge_dst, np.int64)
            em = np.asarray(b.edge_mask) > 0
            # independent count: unique cross-rank (owner, consumer, source)
            # triples over real edges
            cons = dst[em] // rn
            own = src[em] // rn
            triples = {(int(o), int(c), int(u))
                       for o, c, u in zip(own, cons, src[em]) if o != c}
            assert plan.atom_boundary_rows == len(triples)

    def test_comm_volume_proportional_to_boundary_not_NH(self):
        """(b): boundary comm ∝ cut size; the all-reduce formulation's volume
        is O(N·H) regardless. On a multi-graph packed batch the cut is a
        small fraction of the arena, so boundary bytes must undercut the
        all-reduce bytes by a wide margin."""
        store, cfg, setup, mc = _setup(n=16, batch_size=8)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        bb, plan = plan_boundary(b, 8)
        hidden = 256
        comm = plan.comm_bytes_per_conv(hidden)
        allred = plan.allreduce_bytes_per_conv(
            np.asarray(b.nodes).shape[0], np.asarray(b.edge_src).shape[0],
            hidden, heads=4)
        assert comm["atom_conv"] < allred["atom_conv"] / 2
        assert comm["lg_conv"] < allred["lg_conv"] / 2
        # exact accounting: bytes == S · B · 2H · 4
        assert comm["atom_conv"] == 8 * plan.bn * 2 * hidden * 4
        # and the budget B is the padded max PAIR need, so total sent rows
        # (S·B per rank) bounds the true boundary
        assert 8 * 8 * plan.bn >= plan.atom_boundary_rows


class TestBoundaryForward:
    @pytest.mark.parametrize("n_edge", [4, 8])
    def test_matches_single_device(self, n_edge):
        store, cfg, setup, mc = _setup()
        params = init_alignn(jax.random.PRNGKey(0), mc)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        want_mean, want_logvar = alignn_apply(params, mc, b)

        bb, plan = plan_boundary(b, n_edge)
        mesh = make_mesh(1, n_edge, devices=jax.devices()[:n_edge])
        fwd = make_boundary_forward(mesh, mc, -2.9, plan)
        got_mean, got_logvar = fwd(params, stack_boundary_for_mesh([bb], 1))
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_logvar)[0],
                                   np.maximum(np.asarray(want_logvar), -2.9),
                                   rtol=2e-4, atol=2e-5)


def _giant_batch(seed=3):
    """Two ~60-atom random graphs: rank row windows CUT graphs mid-way, so
    the boundary exchange (all_to_all) actually executes — the 2-atom-cell
    batches above have zero cut and never compile it."""
    from gnnep_tpu.models.alignn import AlignnConfig
    from gnnep_tpu.utils.synth import synthetic_batch

    b = synthetic_batch(np.random.default_rng(seed), n_graphs=2,
                        mean_atoms=60, degree=8, node_dim=16, edge_dim=12,
                        angle_dim=7, global_dim=59, table_cap=24,
                        lg_table_cap=40)
    mc = AlignnConfig(node_dim=16, edge_dim=12, angle_dim=7, global_dim=289,
                      target_dim=2, hidden=16, layers=2, heads=2, dropout=0.0,
                      conv_impl="coo")
    return b, mc


class TestGiantGraphBoundary:
    """The formulation's reason to exist: graphs larger than a rank window.
    Nonzero cut → the kv all_to_all is part of the compiled program."""

    @pytest.mark.parametrize("n_edge", [4, 8])
    def test_forward_matches_single_device_with_real_exchange(self, n_edge):
        b, mc = _giant_batch()
        params = init_alignn(jax.random.PRNGKey(0), mc)
        bb, plan = plan_boundary(b, n_edge)
        assert plan.bn > 0 and plan.bl > 0   # the exchange really runs
        want_mean, want_logvar = alignn_apply(params, mc, b)
        mesh = make_mesh(1, n_edge, devices=jax.devices()[:n_edge])
        fwd = make_boundary_forward(mesh, mc, -2.9, plan)
        got_mean, got_logvar = fwd(params, stack_boundary_for_mesh([bb], 1))
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_logvar)[0],
                                   np.maximum(np.asarray(want_logvar), -2.9),
                                   rtol=2e-4, atol=2e-5)

    def test_gradients_match_with_real_exchange(self):
        b, mc = _giant_batch(seed=5)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(4), mc)
        mu = jnp.asarray([4.32, 3.56], dtype=jnp.float32)
        sd = jnp.asarray([0.91, 0.94], dtype=jnp.float32)

        def total_loss(p):
            mean, logvar = alignn_apply(p, mc, b)
            logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
            y_z = (jnp.log(jnp.maximum(b.y, 1e-12)) - mu) / sd
            nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
            nll = nll * b.weight[:, None]
            loss = (nll.mean(axis=1) * b.graph_mask).sum()
            loss += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                          * b.graph_mask[:, None]).sum() / 2.0
            return loss / b.graph_mask.sum()

        want_loss, want_grads = jax.value_and_grad(total_loss)(params)
        bb, plan = plan_boundary(b, 8)
        assert plan.bn > 0 and plan.bl > 0
        mesh = make_mesh(1, 8)
        gfn = make_boundary_grads(mesh, mc, hyper, np.array([4.32, 3.56]),
                                  np.array([0.91, 0.94]), plan)
        got_loss, got_grads = gfn(params, stack_boundary_for_mesh([bb], 1),
                                  jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        for w, g in zip(jax.tree.leaves(want_grads),
                        jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=3e-3, atol=1e-6)


class TestPlanReconstruction:
    """Round-trip invariant: the global (src, dst) edge list of every real
    edge must be reconstructible from the plan's local windows + slot maps.
    Catches any silent mis-slotting (wrong owner, wrong send-list position,
    wrong local offset) that forward-parity tests could mask via symmetry."""

    @pytest.mark.parametrize("seed,n_edge", [(0, 2), (1, 4), (2, 8),
                                             (3, 4), (4, 8)])
    def test_atom_edges_round_trip(self, seed, n_edge):
        from gnnep_tpu.utils.synth import synthetic_batch

        b = synthetic_batch(np.random.default_rng(seed), n_graphs=3,
                            mean_atoms=40, degree=6, node_dim=8, edge_dim=6,
                            angle_dim=5, global_dim=59, table_cap=24,
                            lg_table_cap=40)
        if np.asarray(b.nodes).shape[0] % n_edge:
            pytest.skip("arena not divisible")
        bb, plan = plan_boundary(b, n_edge)
        S, rn, bn = plan.n_shards, plan.rn, plan.bn
        e_rp = np.asarray(b.edge_row_ptr, np.int64)
        e_start = e_rp[np.arange(S) * rn]

        got = set()
        n_send = np.asarray(bb.n_send)
        for s in range(S):
            mask = np.asarray(bb.a_mask[s]) > 0
            for i in np.nonzero(mask)[0]:
                dst_g = int(bb.a_dst[s][i]) + s * rn
                slot = int(bb.a_src_slot[s][i])
                if slot < rn:
                    src_g = slot + s * rn
                else:
                    t, pos = divmod(slot - rn, bn)
                    # slot t·B+pos ⇒ rank t sent its send[s·B+pos] row
                    src_g = int(n_send[t, s * bn + pos]) + t * rn
                got.add((src_g, dst_g))
        em = np.asarray(b.edge_mask) > 0
        want = set(zip(np.asarray(b.edge_src)[em].tolist(),
                       np.asarray(b.edge_dst)[em].tolist()))
        assert got == want

    @pytest.mark.parametrize("seed,n_edge", [(5, 4), (6, 8)])
    def test_lg_edges_round_trip(self, seed, n_edge):
        from gnnep_tpu.utils.synth import synthetic_batch

        b = synthetic_batch(np.random.default_rng(seed), n_graphs=3,
                            mean_atoms=40, degree=6, node_dim=8, edge_dim=6,
                            angle_dim=5, global_dim=59, table_cap=24,
                            lg_table_cap=40)
        if np.asarray(b.nodes).shape[0] % n_edge:
            pytest.skip("arena not divisible")
        bb, plan = plan_boundary(b, n_edge)
        S, rn, bl, e_loc = plan.n_shards, plan.rn, plan.bl, plan.e_loc
        e_rp = np.asarray(b.edge_row_ptr, np.int64)
        e_start = e_rp[np.arange(S) * rn]

        got = set()
        e_send = np.asarray(bb.e_send)
        for s in range(S):
            mask = np.asarray(bb.l_mask[s]) > 0
            for i in np.nonzero(mask)[0]:
                dst_g = int(bb.l_dst[s][i]) + int(e_start[s])
                slot = int(bb.l_src_slot[s][i])
                if slot < e_loc:
                    src_g = slot + int(e_start[s])
                else:
                    t, pos = divmod(slot - e_loc, bl)
                    src_g = int(e_send[t, s * bl + pos]) + int(e_start[t])
                got.add((src_g, dst_g))
        lm = np.asarray(b.lg_mask) > 0
        want = set(zip(np.asarray(b.lg_src)[lm].tolist(),
                       np.asarray(b.lg_dst)[lm].tolist()))
        assert got == want


class TestBoundaryTables:
    """The dense-table / fused-kernel boundary path: the single-chip
    production conv machinery per rank, with raw-state exchange."""

    @pytest.mark.parametrize("n_edge", [4, 8])
    def test_table_path_matches_single_device(self, n_edge):
        from gnnep_tpu.parallel.boundary_shard import build_boundary_tables
        from gnnep_tpu.parallel.train_step import stack_boundary_tables

        b, mc = _giant_batch()
        mc = dataclasses.replace(mc, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), mc)
        bb, plan = plan_boundary(b, n_edge)
        assert plan.bn > 0
        tables, meta = build_boundary_tables(bb, plan)
        want_mean, want_logvar = alignn_apply(params, mc, b)
        mesh = make_mesh(1, n_edge, devices=jax.devices()[:n_edge])
        fwd = make_boundary_forward(mesh, mc, -2.9, plan, meta=meta)
        got_mean, got_logvar = fwd(params, stack_boundary_for_mesh([bb], 1),
                                   stack_boundary_tables(tables))
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_logvar)[0],
                                   np.maximum(np.asarray(want_logvar), -2.9),
                                   rtol=2e-4, atol=2e-5)

    def test_fused_kernel_path_matches(self):
        # interpret-mode Pallas kernels (force_fused) over rank-local windows
        from gnnep_tpu.parallel.boundary_shard import build_boundary_tables
        from gnnep_tpu.parallel.train_step import stack_boundary_tables

        b, mc = _giant_batch(seed=11)
        mc = dataclasses.replace(mc, conv_impl="fused", force_fused=True)
        params = init_alignn(jax.random.PRNGKey(1), mc)
        bb, plan = plan_boundary(b, 4)
        tables, meta = build_boundary_tables(bb, plan)
        want_mean, _ = alignn_apply(params, mc, b)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        fwd = make_boundary_forward(mesh, mc, -2.9, plan, meta=meta)
        got_mean, _ = fwd(params, stack_boundary_for_mesh([bb], 1),
                          stack_boundary_tables(tables))
        np.testing.assert_allclose(np.asarray(got_mean)[0],
                                   np.asarray(want_mean),
                                   rtol=5e-4, atol=5e-5)

    def test_table_gradients_match(self):
        from gnnep_tpu.parallel.boundary_shard import build_boundary_tables
        from gnnep_tpu.parallel.train_step import stack_boundary_tables

        b, mc = _giant_batch(seed=13)
        mc = dataclasses.replace(mc, conv_impl="table")
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(6), mc)
        mu = jnp.asarray([4.32, 3.56], dtype=jnp.float32)
        sd = jnp.asarray([0.91, 0.94], dtype=jnp.float32)

        def total_loss(p):
            mean, logvar = alignn_apply(p, mc, b)
            logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
            y_z = (jnp.log(jnp.maximum(b.y, 1e-12)) - mu) / sd
            nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
            nll = nll * b.weight[:, None]
            loss = (nll.mean(axis=1) * b.graph_mask).sum()
            loss += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                          * b.graph_mask[:, None]).sum() / 2.0
            return loss / b.graph_mask.sum()

        want_loss, want_grads = jax.value_and_grad(total_loss)(params)
        bb, plan = plan_boundary(b, 8)
        tables, meta = build_boundary_tables(bb, plan)
        mesh = make_mesh(1, 8)
        gfn = make_boundary_grads(mesh, mc, hyper, np.array([4.32, 3.56]),
                                  np.array([0.91, 0.94]), plan, meta=meta)
        got_loss, got_grads = gfn(params, stack_boundary_for_mesh([bb], 1),
                                  stack_boundary_tables(tables),
                                  jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        for w, g in zip(jax.tree.leaves(want_grads),
                        jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=3e-3, atol=1e-6)

    def test_table_train_step_runs(self):
        from gnnep_tpu.parallel.boundary_shard import (build_boundary_tables,
                                                       plan_boundary_batches)
        from gnnep_tpu.parallel.train_step import stack_boundary_tables

        from gnnep_tpu.data.batching import equalize_batches

        b1, mc = _giant_batch(seed=21)
        b2, _ = _giant_batch(seed=22)
        b1, b2 = equalize_batches([b1, b2])   # shared arena capacities
        mc = dataclasses.replace(mc, conv_impl="table", dropout=0.2)
        hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(8), mc)
        smask = sigma_mask(params)
        pbs, plan = plan_boundary_batches([b1, b2], 4)
        tables, meta = build_boundary_tables(pbs, plan)
        mesh = make_mesh(2, 4)
        step, init_opt = make_boundary_train_step(
            mesh, mc, hyper, np.array([4.32, 3.56]), np.array([0.91, 0.94]),
            plan, meta=meta)
        got, _, loss, n = step(params, init_opt(params),
                               stack_boundary_for_mesh(pbs, 2),
                               stack_boundary_tables(tables),
                               jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(got))


class TestBoundaryScanStep:
    def test_scan_equals_sequential_steps(self):
        """The K-step scan program must reproduce K sequential boundary
        steps exactly (no dropout/jitter → rng-independent)."""
        from gnnep_tpu.parallel.boundary_shard import build_boundary_tables
        from gnnep_tpu.parallel.train_step import (make_boundary_scan_step,
                                                   stack_boundary_tables)

        b, mc = _giant_batch(seed=31)
        mc = dataclasses.replace(mc, conv_impl="table", dropout=0.0)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(9), mc)
        smask = sigma_mask(params)
        bb, plan = plan_boundary(b, 4)
        tables, meta = build_boundary_tables(bb, plan)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        mu, sd = np.array([4.32, 3.56]), np.array([0.91, 0.94])

        step, init_opt = make_boundary_train_step(mesh, mc, hyper, mu, sd,
                                                  plan, meta=meta)
        one = stack_boundary_for_mesh([bb], 1)
        tb = stack_boundary_tables(tables)
        # both steps donate (params, opt): start each from a host copy
        p0 = jax.tree.map(np.asarray, params)
        p_seq = jax.tree.map(jnp.asarray, p0)
        o_seq = init_opt(p_seq)
        losses_seq = []
        for k in range(2):
            p_seq, o_seq, loss, _ = step(p_seq, o_seq, one, tb,
                                         jax.random.PRNGKey(5), 3e-4, 1e-4,
                                         smask)
            losses_seq.append(float(loss))

        multi, init_opt2 = make_boundary_scan_step(mesh, mc, hyper, mu, sd,
                                                   plan, meta=meta)
        stacked = jax.tree.map(
            lambda x: np.stack([np.asarray(x)] * 2), one)
        p_in = jax.tree.map(jnp.asarray, p0)
        p_scan, o_scan, losses, ns = multi(p_in, init_opt2(p_in), stacked,
                                           tb, jax.random.PRNGKey(5), 3e-4,
                                           1e-4, smask)
        np.testing.assert_allclose(np.asarray(losses), losses_seq,
                                   rtol=1e-5, atol=1e-6)
        for a, bleaf in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_scan)):
            np.testing.assert_allclose(np.asarray(bleaf), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)


class TestBoundaryGradients:
    def test_matches_single_device_and_allreduce(self):
        """(a): boundary grads ≡ the single-device global-mean gradient ≡ the
        all-reduce formulation's grads, on the 8-virtual-device mesh."""
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        hyper = TrainHyper(feature_jitter_std=0.0, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(2), mc)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        mu = jnp.asarray(setup.transformer.means, dtype=jnp.float32)
        sd = jnp.asarray(setup.transformer.stds, dtype=jnp.float32)

        def total_loss(p):
            loss_sum, count = 0.0, 0.0
            for b in batches:
                mean, logvar = alignn_apply(p, mc, b)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(b.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                nll = nll * b.weight[:, None]
                loss_sum += (nll.mean(axis=1) * b.graph_mask).sum()
                loss_sum += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                                  * b.graph_mask[:, None]
                                                  ).sum() / 2.0
                count += b.graph_mask.sum()
            return loss_sum / count

        want_loss, want_grads = jax.value_and_grad(total_loss)(params)

        mesh = make_mesh(2, 4)
        pbs, plan = plan_boundary_batches(batches, 4)
        gfn = make_boundary_grads(mesh, mc, hyper, setup.transformer.means,
                                  setup.transformer.stds, plan)
        got_loss, got_grads = gfn(params, stack_boundary_for_mesh(pbs, 2),
                                  jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        for w, g in zip(jax.tree.leaves(want_grads),
                        jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=1e-6)

        # direct parity with the all-reduce formulation's gradient pipeline
        from gnnep_tpu.parallel.edge_shard import sharded_apply

        def device_grads(p, batch):
            batch = jax.tree.map(lambda x: x[0], batch)

            def local_loss(pp):
                mean, logvar = sharded_apply(pp, mc, batch,
                                             axis_name=EDGE_AXIS, train=False)
                logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
                y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd
                nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar))
                loss = (nll.mean(axis=1) * batch.graph_mask).sum()
                loss += hyper.log_sigma_l2 * ((0.5 * logvar) ** 2
                                              * batch.graph_mask[:, None]
                                              ).sum() / 2.0
                return loss

            g = jax.grad(local_loss)(p)
            g = jax.lax.pmean(g, EDGE_AXIS)
            g = jax.lax.psum(g, DATA_AXIS)
            n = jax.lax.psum(batch.graph_mask.sum(), DATA_AXIS)
            return jax.tree.map(lambda x: x / n, g)

        ar_grads = jax.jit(shard_map(
            device_grads, mesh=mesh, in_specs=(P(), batch_pspecs()),
            out_specs=P(), check=False))(params, stack_for_mesh(batches, 2))
        for a, g in zip(jax.tree.leaves(ar_grads), jax.tree.leaves(got_grads)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                       rtol=2e-3, atol=1e-6)


class TestBoundaryTrainStep:
    def test_step_runs_and_counts(self):
        store, cfg, setup, mc = _setup(n=16, batch_size=4)
        mc = dataclasses.replace(mc, dropout=0.2)
        hyper = TrainHyper(feature_jitter_std=0.1, log_sigma_l2=0.1)
        params = init_alignn(jax.random.PRNGKey(3), mc)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)[:2]
        pbs, plan = plan_boundary_batches(batches, 4)
        mesh = make_mesh(2, 4)
        step, init_opt = make_boundary_train_step(
            mesh, mc, hyper, setup.transformer.means, setup.transformer.stds,
            plan)
        got, _, loss, n = step(params, init_opt(params),
                               stack_boundary_for_mesh(pbs, 2),
                               jax.random.PRNGKey(0), 3e-4, 1e-4, smask)
        assert float(n) == sum(float(np.asarray(b.graph_mask).sum())
                               for b in batches)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(got))

    def test_loss_replicated_across_edge_ranks(self):
        """The replicated tail (feat_proj dropout, jitter on globals) must use
        shared keys: per-edge-rank losses have to agree exactly, or the
        gradient accounting is wrong."""
        store, cfg, setup, mc = _setup(n=12, batch_size=6)
        mc = dataclasses.replace(mc, dropout=0.3)
        params = init_alignn(jax.random.PRNGKey(5), mc)
        b = epoch_batches(setup.store, setup.train_idx, setup.budget,
                          shuffle=False)[0]
        bb, plan = plan_boundary(b, 8)
        mesh = make_mesh(1, 8)

        from gnnep_tpu.parallel.boundary_shard import boundary_apply
        from gnnep_tpu.parallel.train_step import boundary_pspecs, \
            _strip_boundary

        def device_out(p, sb, rng):
            sb = _strip_boundary(sb)
            mean, logvar = boundary_apply(p, mc, sb, plan,
                                          axis_name=EDGE_AXIS, train=True,
                                          rng=rng)
            return mean[None]  # per-rank copy, stacked for comparison

        outs = jax.jit(shard_map(
            device_out, mesh=mesh,
            in_specs=(P(), boundary_pspecs(), P()),
            out_specs=P(EDGE_AXIS), check=False))(
                params, stack_boundary_for_mesh([bb], 1),
                jax.random.PRNGKey(9))
        outs = np.asarray(outs)
        for r in range(1, 8):
            np.testing.assert_allclose(outs[r], outs[0], rtol=1e-6, atol=1e-7)


class TestBoundaryScheduling:
    """Structural verification of the overlap claim (VERDICT r4 item 4b):
    one `all_to_all` per convolution, and on the raw-state-exchange path the
    exchange depends on NO local GEMM — it can leave the rank before any of
    the conv's projection work, so the latency-hiding scheduler is free to
    overlap the ICI transfer with all local compute."""

    @staticmethod
    def _shard_map_body(fn, *args):
        from jax._src.core import Var

        jaxpr = jax.make_jaxpr(fn)(*args)

        def find(jx):
            for eqn in jx.eqns:
                if eqn.primitive.name == "shard_map":
                    return eqn.params["jaxpr"]
                for v in eqn.params.values():
                    inner = getattr(v, "jaxpr", v)
                    if hasattr(inner, "eqns"):
                        got = find(inner)
                        if got is not None:
                            return got
            return None

        body = find(jaxpr.jaxpr)
        assert body is not None, "no shard_map in program"
        producer = {}
        for i, eqn in enumerate(body.eqns):
            for ov in eqn.outvars:
                if isinstance(ov, Var):
                    producer[ov] = i
        return body, producer

    @staticmethod
    def _ancestors(body, producer, eqn_idx):
        """Indices of eqns transitively upstream of eqn `eqn_idx`."""
        from jax._src.core import Var

        seen = set()
        stack = [v for v in body.eqns[eqn_idx].invars
                 if isinstance(v, Var) and v in producer]
        while stack:
            v = stack.pop()
            i = producer[v]
            if i in seen:
                continue
            seen.add(i)
            stack.extend(w for w in body.eqns[i].invars
                         if isinstance(w, Var) and w in producer)
        return seen

    def test_one_all_to_all_per_conv_in_lowered_hlo(self):
        """The compiled forward carries exactly 2·L all_to_alls: one per
        LG conv + one per atom conv, no hidden extras."""
        b, mc = _giant_batch()
        bb, plan = plan_boundary(b, 4)
        assert plan.bn > 0 and plan.bl > 0
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        params = init_alignn(jax.random.PRNGKey(0), mc)
        fwd = make_boundary_forward(mesh, mc, -2.9, plan)
        txt = fwd.lower(params,
                        stack_boundary_for_mesh([bb], 1)).as_text()
        assert txt.count("stablehlo.all_to_all") == 2 * mc.layers

    def test_raw_exchange_depends_on_no_conv_projection(self):
        """Table/fused path (raw-state exchange): each conv's all_to_all
        depends ONLY on the state-producing work of previous layers — never
        on any of ITS OWN conv's projection GEMMs. Pinned sharply for
        layer 1: the LG exchange's entire GEMM ancestry is the 2-dot edge
        encoder; the atom exchange's is the 2-dot node encoder. Every conv
        shows strictly fewer GEMM ancestors than the kv-wire path, whose
        exchange legitimately waits on the k/v projection."""
        import dataclasses as dc

        from gnnep_tpu.parallel.boundary_shard import build_boundary_tables
        from gnnep_tpu.parallel.train_step import stack_boundary_tables

        b, mc = _giant_batch()
        mc_tab = dc.replace(mc, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), mc_tab)
        bb, plan = plan_boundary(b, 4)
        tables, meta = build_boundary_tables(bb, plan)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])

        def dot_ancestor_counts(fwd, *args):
            body, producer = self._shard_map_body(fwd, *args)
            a2a = [i for i, e in enumerate(body.eqns)
                   if e.primitive.name == "all_to_all"]
            assert len(a2a) == 2 * mc.layers
            return [sum(1 for k in self._ancestors(body, producer, i)
                        if body.eqns[k].primitive.name == "dot_general")
                    for i in a2a]

        raw = dot_ancestor_counts(
            make_boundary_forward(mesh, mc_tab, -2.9, plan, meta=meta),
            params, stack_boundary_for_mesh([bb], 1),
            stack_boundary_tables(tables))
        kv = dot_ancestor_counts(
            make_boundary_forward(mesh, mc, -2.9, plan),
            params, stack_boundary_for_mesh([bb], 1))
        # layer 1: raw exchanges encoder outputs only (2-dot MLP each)
        assert raw[0] == 2 and raw[1] == 2, raw
        # every conv: the raw wire skips this conv's projection GEMMs
        for k, (r, v) in enumerate(zip(raw, kv)):
            assert r < v, (k, raw, kv)

    def test_kv_exchange_has_overlappable_gemms_after_issue(self):
        """kv path (boundary_conv): the wire format is projected kv, so the
        exchange legitimately depends on the k/v projection — but for every
        all_to_all there must exist LATER local GEMMs that do NOT consume
        its result (the q/e/skip projections), i.e. real local work the
        scheduler can overlap the transfer with."""
        b, mc = _giant_batch()
        params = init_alignn(jax.random.PRNGKey(0), mc)
        bb, plan = plan_boundary(b, 4)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        fwd_kv = make_boundary_forward(mesh, mc, -2.9, plan)
        body, producer = self._shard_map_body(
            fwd_kv, params, stack_boundary_for_mesh([bb], 1))
        a2a = [i for i, e in enumerate(body.eqns)
               if e.primitive.name == "all_to_all"]
        assert len(a2a) == 2 * mc.layers
        dots = [i for i, e in enumerate(body.eqns)
                if e.primitive.name == "dot_general"]
        for i in a2a:
            independent_later = [
                j for j in dots if j > i
                and i not in self._ancestors(body, producer, j)]
            assert independent_later, (
                f"no overlappable GEMM after all_to_all at eqn {i}")
