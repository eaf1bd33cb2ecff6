"""Tests for the dataset layer (L2): store round-trips, splits, transforms,
and the static-shape batch packer."""
import numpy as np
import pytest

from gnnep_tpu.data.batching import BatchBudget, BatchPacker, GraphBatch, epoch_batches
from gnnep_tpu.data.splits import derive_splits, group_indices, group_kfold, group_split_four
from gnnep_tpu.data.store import GraphStore, load_sample, save_sample, write_index
from gnnep_tpu.data.transforms import FeatureScaler, LogTransformer

from synthetic import make_samples, make_store


class TestStore:
    def test_sample_roundtrip(self, tmp_path):
        s = make_samples(1)[0]
        p = save_sample(tmp_path, s)
        s2 = load_sample(p)
        np.testing.assert_allclose(s2.node_feats, s.node_feats)
        np.testing.assert_array_equal(s2.lg_src, s.lg_src)
        assert s2.material_id == s.material_id and s2.sg_num == s.sg_num
        np.testing.assert_allclose(s2.y, s.y)

    def test_arena_offsets(self):
        samples = make_samples(5)
        store = GraphStore.from_samples(samples)
        assert store.n_graphs == 5
        for g, s in enumerate(samples):
            got = store.sample(g)
            np.testing.assert_allclose(got.node_feats, s.node_feats)
            # the store canonicalizes each graph to dst-sorted edge order
            # (the model is edge-permutation invariant); same edge set,
            # features traveling with their edges
            assert np.all(np.diff(got.edge_dst) >= 0)
            assert np.all(np.diff(got.lg_dst) >= 0)

            def key(src, dst, attr):
                rows = [(int(a), int(b), tuple(np.round(c, 5)))
                        for a, b, c in zip(src, dst, attr)]
                return sorted(rows)

            assert key(got.edge_src, got.edge_dst, got.edge_attr) == \
                key(s.edge_src, s.edge_dst, s.edge_attr)
            # LG endpoints are remapped through the bond permutation — check
            # the angle-feature multiset survives
            assert sorted(map(tuple, np.round(got.lg_attr, 5))) == \
                sorted(map(tuple, np.round(s.lg_attr, 5)))

    def test_load_dir_with_cache(self, tmp_path):
        for s in make_samples(4):
            save_sample(tmp_path, s)
        store1 = GraphStore.load_dir(tmp_path)
        assert (tmp_path / "_arena_cache").is_dir()
        store2 = GraphStore.load_dir(tmp_path)  # from cache, memory-mapped
        assert isinstance(store2.node_feats, np.memmap)
        np.testing.assert_allclose(store1.node_feats, store2.node_feats)
        assert store1.material_ids == store2.material_ids
        # cache invalidates when the fileset changes
        for s in make_samples(5)[4:]:
            save_sample(tmp_path, s)
        store3 = GraphStore.load_dir(tmp_path)
        assert store3.n_graphs == 5
        write_index(tmp_path, store3)
        full = (tmp_path / "index.json").read_text()
        from gnnep_tpu.data.store import write_index_streaming

        n = write_index_streaming(tmp_path)
        assert n == store3.n_graphs
        # the streaming builder (never materializes the dataset) must write
        # a byte-identical manifest
        assert (tmp_path / "index.json").read_text() == full
        assert (tmp_path / "index.json").exists()

    def test_target_filtering(self):
        samples = make_samples(4)
        samples[2].y = None
        store = GraphStore.from_samples(samples).filter_targets()
        assert store.n_graphs == 3
        assert "mp-0002" not in store.material_ids


class TestSplits:
    def test_deterministic_and_disjoint(self):
        keys = [f"g{i % 10}" for i in range(50)]
        g2i = group_indices(keys)
        a = group_split_four(g2i, 42, 0.2, 0.1, 0.1)
        b = group_split_four(g2i, 42, 0.2, 0.1, 0.1)
        assert a == b
        all_idx = sorted(sum((list(x) for x in a), []))
        assert all_idx == list(range(50))
        sets = [set(x) for x in a]
        for i in range(4):
            for j in range(i + 1, 4):
                assert not (sets[i] & sets[j])

    def test_groups_not_split_across_partitions(self):
        keys = [f"g{i % 10}" for i in range(50)]
        g2i = group_indices(keys)
        tr, va, ca, te = group_split_four(g2i, 7, 0.2, 0.1, 0.1)
        for part in (tr, va, ca, te):
            part_groups = {keys[i] for i in part}
            for g in part_groups:
                assert set(g2i[g]) <= set(part)

    def test_kfold_partitions_train(self):
        keys = [f"g{i}" for i in range(20)]
        g2i = group_indices(keys)
        train = list(range(16))
        folds = group_kfold(g2i, train, 4, 0)
        joined = sorted(sum(folds, []))
        assert joined == sorted(train)

    def test_derive_splits_end_to_end(self):
        store = make_store(12)
        tr, va, ca, te, folds = derive_splits(store.group_keys(), 42, 0.1, 0.1, 0.1, 3)
        assert len(tr) + len(va) + len(ca) + len(te) == 12
        assert sorted(sum(folds, [])) == tr


class TestTransforms:
    def test_scaler_zero_mean_unit_std(self):
        store = make_store(8)
        idx = list(range(8))
        scaler = FeatureScaler.fit(store, idx)
        std_store = scaler.apply(store)
        x = std_store.node_feats
        varying = store.node_feats.std(axis=0) > 1e-8
        np.testing.assert_allclose(x[:, varying].mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(x[:, varying].std(axis=0), 1.0, atol=1e-3)
        g = std_store.global_scalars
        gv = store.global_scalars.std(axis=0) > 1e-8
        np.testing.assert_allclose(g[:, gv].mean(axis=0), 0.0, atol=1e-4)

    def test_scaler_state_roundtrip(self):
        store = make_store(6)
        scaler = FeatureScaler.fit(store, list(range(6)))
        s2 = FeatureScaler.from_state_dict(scaler.state_dict())
        np.testing.assert_allclose(s2.scalar_mean, scaler.scalar_mean)
        a = scaler.apply(store).node_feats
        b = s2.apply(store).node_feats
        np.testing.assert_allclose(a, b)

    def test_log_transformer(self):
        y = np.abs(np.random.default_rng(0).normal(50, 20, (100, 2))) + 1.0
        t = LogTransformer.fit(y)
        z = t.transform(y)
        np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-9)
        np.testing.assert_allclose(z.std(axis=0), 1.0, atol=1e-9)
        np.testing.assert_allclose(t.inverse(z), y, rtol=1e-9)
        t2 = LogTransformer.from_state_dict(t.state_dict())
        np.testing.assert_allclose(t2.transform(y), z)

    def test_log_transformer_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            LogTransformer.fit(np.array([[1.0, -2.0]]))


class TestBatching:
    def test_budget_and_single_batch(self):
        store = make_store(6)
        budget = BatchBudget.plan(store, range(6), batch_size=6)
        batches = list(BatchPacker(store, budget).pack(range(6)))
        assert len(batches) == 1
        b = batches[0]
        assert b.n_real_graphs == 6
        Np, Ep, Lp, G = b.capacity
        assert (Np % 8, Ep % 8, Lp % 8) == (0, 0, 0)
        # arena reconstruction: per-graph node features match the store
        for slot in range(6):
            sel = b.node_graph == slot
            orig = store.sample(int(b.sample_index[slot]))
            np.testing.assert_allclose(b.nodes[sel], orig.node_feats)

    def test_dummy_conventions(self):
        store = make_store(6)
        budget = BatchBudget.plan(store, range(6), batch_size=3)
        b = next(iter(BatchPacker(store, budget).pack(range(6))))
        Np, Ep, Lp, G = b.capacity
        pad_e = b.edge_mask == 0
        assert pad_e.any()
        assert (b.edge_src[pad_e] == Np - 1).all() and (b.edge_dst[pad_e] == Np - 1).all()
        pad_l = b.lg_mask == 0
        if pad_l.any():
            assert (b.lg_src[pad_l] == Ep - 1).all()
        # padded nodes map to graph slot G
        assert (b.node_graph[b.nodes.sum(axis=1) == 0] <= G).all()
        assert (np.sort(np.unique(b.node_graph))[-1] == G)

    def test_target_validity_mask(self):
        # y_mask is the authority on target presence: a real material with
        # K=G=1.0 GPa (the padding fill value) must keep its ground truth,
        # and missing components must surface as NaN from the collectors
        store = make_store(4)
        store.y[0] = [1.0, 1.0]        # legitimate ground truth
        store.y[1] = [np.nan, np.nan]  # missing target
        store.y[2] = [50.0, np.nan]    # partially missing
        budget = BatchBudget.plan(store, range(4), batch_size=4)
        b = next(iter(BatchPacker(store, budget).pack(range(4))))
        row = {int(g): slot for slot, g in enumerate(b.sample_index) if g >= 0}
        np.testing.assert_array_equal(b.y_mask[row[0]], [1.0, 1.0])
        np.testing.assert_array_equal(b.y[row[0]], [1.0, 1.0])
        np.testing.assert_array_equal(b.y_mask[row[1]], [0.0, 0.0])
        np.testing.assert_array_equal(b.y_mask[row[2]], [1.0, 0.0])
        assert np.isfinite(b.y).all()  # y itself stays log-safe
        pad = np.asarray(b.graph_mask) == 0
        if pad.any():
            assert (np.asarray(b.y_mask)[pad] == 0).all()

        from gnnep_tpu.train.loop import collect_predictions

        def fake_fwd(params, bb):
            z = np.zeros(np.asarray(bb.y).shape, np.float32)
            return z, z

        _, _, ys, idxs = collect_predictions(fake_fwd, None, [b])
        m = {int(i): r for r, i in enumerate(idxs)}
        np.testing.assert_array_equal(ys[m[0]], [1.0, 1.0])
        assert np.isnan(ys[m[1]]).all()
        assert ys[m[2]][0] == pytest.approx(50.0) and np.isnan(ys[m[2]][1])

    def test_invalid_targets_do_not_enter_the_loss(self):
        """y_mask is consumed by the loss: a masked-out target component's
        value must not change loss or gradients (its 1.0 fill would
        otherwise be trained toward)."""
        import jax
        import jax.numpy as jnp

        from gnnep_tpu.models.alignn import init_alignn
        from gnnep_tpu.train.loop import TrainHyper, hetero_nll
        from gnnep_tpu.utils.synth import flagship_config, synthetic_batch

        import dataclasses

        b = synthetic_batch(np.random.default_rng(0), n_graphs=4,
                            mean_atoms=5, degree=3, node_dim=8, edge_dim=6,
                            angle_dim=5, global_dim=59, table_cap=16,
                            lg_table_cap=16)
        cfg = dataclasses.replace(
            flagship_config(node_dim=8, edge_dim=6, angle_dim=5),
            hidden=16, layers=1, heads=2, dropout=0.0, conv_impl="coo")
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        hyper = TrainHyper(feature_jitter_std=0.0)
        ym = np.asarray(b.y_mask).copy()
        ym[1, 1] = 0.0                       # graph 1's G target is invalid
        mu, sd = jnp.zeros(2), jnp.ones(2)

        def loss_of(y_val):
            y = np.asarray(b.y).copy()
            y[1, 1] = y_val
            bb = b._replace(y=y, y_mask=ym)
            y_z = (jnp.log(jnp.maximum(bb.y, 1e-12)) - mu) / sd
            loss, _ = hetero_nll(params, cfg, hyper, bb, y_z, None,
                                 train=False)
            return float(loss)

        assert loss_of(1.0) == loss_of(123.0)  # masked value is inert
        # and with all-valid masks the loss equals the plain target mean
        bb = b._replace(y_mask=np.ones_like(np.asarray(b.y_mask)))
        y_z = (jnp.log(jnp.maximum(bb.y, 1e-12)) - mu) / sd
        loss_masked, _ = hetero_nll(params, cfg, hyper, bb, y_z, None,
                                    train=False)
        assert np.isfinite(float(loss_masked))

    def test_edge_indices_offset_correctly(self):
        store = make_store(6)
        budget = BatchBudget.plan(store, range(6), batch_size=6)
        b = next(iter(BatchPacker(store, budget).pack(range(6))))
        # every real edge endpoint belongs to the same graph slot on both sides
        real = b.edge_mask == 1
        src_graph = b.node_graph[b.edge_src[real]]
        dst_graph = b.node_graph[b.edge_dst[real]]
        np.testing.assert_array_equal(src_graph, dst_graph)
        # real lg edges connect bonds of the same graph
        lreal = b.lg_mask == 1
        np.testing.assert_array_equal(
            b.node_graph[b.edge_src[b.lg_src[lreal]]],
            b.node_graph[b.edge_src[b.lg_dst[lreal]]])

    def test_multi_batch_split(self):
        store = make_store(10)
        budget = BatchBudget.plan(store, range(10), batch_size=4)
        batches = list(BatchPacker(store, budget).pack(range(10)))
        assert sum(b.n_real_graphs for b in batches) == 10
        assert all(b.capacity == batches[0].capacity for b in batches)

    def test_epoch_batches_shuffle_deterministic(self):
        store = make_store(10)
        budget = BatchBudget.plan(store, range(10), batch_size=4)
        a = epoch_batches(store, range(10), budget, shuffle=True,
                         rng=np.random.default_rng(1))
        b = epoch_batches(store, range(10), budget, shuffle=True,
                         rng=np.random.default_rng(1))
        np.testing.assert_array_equal(a[0].sample_index, b[0].sample_index)

    def test_oversize_graph_raises(self):
        store = make_store(4)
        budget = BatchBudget(n_graphs=2, n_nodes=2, n_edges=8, n_lg_edges=8)
        with pytest.raises(ValueError, match="exceeds batch budget"):
            list(BatchPacker(store, budget).pack(range(4)))


class TestHeavyTailPacking:
    def test_mean_budget_utilization_and_coverage(self):
        """Heavy-tailed graph sizes: every graph still packs (tail graphs
        force early emission) and typical batches aren't mostly padding."""
        import synthetic as syn
        from gnnep_tpu.data.featurize import BasisConfig, build_graph
        from gnnep_tpu.data.structure import Lattice, Structure
        from gnnep_tpu.data.store import GraphStore

        rng = np.random.default_rng(3)
        basis = BasisConfig(rbf_n=4, rbf_cutoff=4.0, angle_n=4)
        samples = []
        for i in range(24):
            # 2-atom cells except a few dense 8-atom tail graphs
            n = 8 if i % 8 == 0 else 2
            a = 3.2 + 0.1 * (i % 4)
            fr = rng.random((n, 3))
            s = Structure(Lattice(np.eye(3) * a), ["Si"] * n, fr)
            samples.append(build_graph(s, material_id=f"h{i}", y=[50.0, 30.0],
                                       basis=basis, nn_method="cutoff",
                                       cutoff=a * 0.95, prototype=f"p{i}"))
        store = GraphStore.from_samples(samples)
        budget = BatchBudget.plan(store, range(24), batch_size=8)
        batches = list(BatchPacker(store, budget).pack(range(24)))
        packed = np.concatenate([b.sample_index[np.asarray(b.graph_mask) > 0]
                                 for b in batches])
        assert sorted(packed.tolist()) == list(range(24))  # nothing dropped
        # median batch should use a decent share of its LG capacity
        utils = [float(np.asarray(b.lg_mask).sum()) / b.lg_src.shape[0]
                 for b in batches]
        assert np.median(utils) > 0.3, utils


class TestWindowDilution:
    def test_plan_dilution_honors_bound(self):
        from gnnep_tpu.data.batching import plan_dilution
        rng = np.random.default_rng(0)
        counts = rng.integers(0, 12, 300)
        counts[40:60] = 30                      # a dense stretch
        new = plan_dilution(counts, bound=220, cap_rows=1024, group=64)
        assert new is not None
        assert np.all(np.diff(new) >= 1)        # monotone, no collisions
        groups = new // 64
        for g in np.unique(groups):
            assert counts[groups == g].sum() <= 220
        # insufficient capacity → None
        assert plan_dilution(counts, bound=40, cap_rows=310, group=64) is None

    def test_packed_batches_honor_budget_bounds(self):
        from gnnep_tpu.data.batching import measure_win64
        store = make_store(12, seed=5)
        budget = BatchBudget.plan(store, range(12), batch_size=6)
        assert budget.edge_win64 > 0 and budget.lg_win64 > 0
        for b in BatchPacker(store, budget).pack(range(12)):
            Np, Ep, Lp, G = b.capacity
            assert measure_win64(np.asarray(b.edge_dst), Np) <= budget.edge_win64
            assert measure_win64(np.asarray(b.lg_dst), Ep) <= budget.lg_win64

    def test_pack_parallel_deferral_coverage(self):
        """pack_parallel with dilution-forced deferrals: every graph appears
        exactly once (deferred graphs repack at the epoch tail), all window
        bounds hold, and the batch CONTENTS match the serial packer's for
        the graphs that share a batch composition."""
        import dataclasses as dc
        from gnnep_tpu.data.batching import measure_win64

        store = make_store(8, seed=3)
        base_budget = BatchBudget.plan(store, range(8), batch_size=8)
        roomy = dc.replace(base_budget,
                           n_nodes=base_budget.n_nodes + 256,
                           n_edges=base_budget.n_edges + 512,
                           n_lg_edges=base_budget.n_lg_edges + 512)
        tight = dc.replace(
            roomy,
            edge_win64=max(base_budget.max_in_degree + 130, 136),
            lg_win64=max(base_budget.max_lg_in_degree + 2, 34))
        serial = list(BatchPacker(store, tight).pack(range(8)))
        assert len(serial) > 1, "test setup: no deferral forced"
        par = BatchPacker(store, tight).pack_parallel(range(8), workers=3)
        for batches in (serial, par):
            packed = np.concatenate([np.asarray(b.sample_index)
                                     for b in batches])
            assert sorted(packed[packed >= 0].tolist()) == list(range(8))
            for b in batches:
                Np, Ep, _, _ = b.capacity
                assert measure_win64(np.asarray(b.edge_dst),
                                     Np) <= tight.edge_win64
                assert measure_win64(np.asarray(b.lg_dst),
                                     Ep) <= tight.lg_win64

    def test_dilution_preserves_model_outputs(self):
        """Forcing heavy dilution must not change any real graph's output."""
        import dataclasses as dc
        import jax
        from gnnep_tpu.data.batching import measure_win64
        from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn

        store = make_store(8, seed=3)
        base_budget = BatchBudget.plan(store, range(8), batch_size=8)
        # generous arenas so the diluted variant fits
        roomy = dc.replace(base_budget,
                           n_nodes=base_budget.n_nodes + 256,
                           n_edges=base_budget.n_edges + 512,
                           n_lg_edges=base_budget.n_lg_edges + 512)
        plain = dc.replace(roomy, edge_win64=0, lg_win64=0)
        # tight bounds (floored at the max single-target span) force gaps
        tight = dc.replace(
            roomy,
            edge_win64=max(base_budget.max_in_degree + 130, 136),
            lg_win64=max(base_budget.max_lg_in_degree + 2, 34))
        b0 = next(iter(BatchPacker(store, plain).pack(range(8))))
        diluted = list(BatchPacker(store, tight).pack(range(8)))
        # the tight bound forces heavy dilution → the packer defers graphs
        assert len(diluted) > 1
        for b in diluted:
            Np, Ep, _, _ = b.capacity
            assert measure_win64(np.asarray(b.edge_dst), Np) <= tight.edge_win64
            assert measure_win64(np.asarray(b.lg_dst), Ep) <= tight.lg_win64
        # every graph packed exactly once
        packed = np.concatenate([np.asarray(b.sample_index) for b in diluted])
        assert sorted(packed[packed >= 0].tolist()) == list(range(8))

        cfg = AlignnConfig(node_dim=store.node_dim, edge_dim=store.edge_dim,
                           angle_dim=store.angle_dim,
                           global_dim=store.global_scalar_dim + 230,
                           target_dim=2, hidden=16, layers=2, heads=2,
                           dropout=0.0, conv_impl="table")
        params = init_alignn(jax.random.PRNGKey(0), cfg)
        m0, _ = alignn_apply(params, cfg, b0)
        by_sample = {}
        for b in diluted:
            m1, _ = alignn_apply(params, cfg, b)
            for slot, s_idx in enumerate(np.asarray(b.sample_index)):
                if s_idx >= 0:
                    by_sample[int(s_idx)] = np.asarray(m1)[slot]
        for slot, s_idx in enumerate(np.asarray(b0.sample_index)):
            if s_idx >= 0:
                np.testing.assert_allclose(np.asarray(m0)[slot],
                                           by_sample[int(s_idx)],
                                           rtol=2e-4, atol=1e-5)
