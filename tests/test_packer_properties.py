"""Property-based fuzz of the batch packer (`data.batching`).

The packer is the keystone the whole TPU formulation rests on: the fused
kernels, win64 window bounds, dense tables, and CSR row pointers all assume
invariants the packer promises but that unit fixtures only spot-check. This
suite drives `epoch_batches` with RANDOM graph stores (heavy-tailed degrees,
hub nodes, edge-free and angle-free graphs, multigraph edges) and asserts the
full contract on every emitted batch:

  1. coverage     — every requested graph appears exactly once across the
                    epoch (dilution deferral must not drop or duplicate)
  2. CSR layout   — dst arenas are globally non-decreasing; the precomputed
                    row pointers equal searchsorted(dst, arange)
  3. win64 bounds — measured aligned-64-group spans fit the budget's kernel
                    window bounds (the silent-wrong-output hazard class)
  4. tables       — dense in/out tables and their inverse position maps are
                    mutually consistent bijections over the real edges
  5. content      — per graph slot, the packed nodes/edges/angles/globals/y
                    are exactly the store sample's (as multisets, since
                    dilution may interleave padding and reorder rows)
  6. weights      — per-sample loss weights ride into `batch.weight`

The reference has no analogous component (PyG batching concatenates
dynamically, /root/reference/scripts/train.py:25); this contract is new TPU
surface, hence the heavier testing.
"""
import dataclasses

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import (given, example, settings, strategies as st, assume,
                        HealthCheck)

from gnnep_tpu.data.batching import (BatchBudget, epoch_batches, measure_win64,
                                     measure_seg_win64, verify_win64)
from gnnep_tpu.data.featurize import GraphSample
from gnnep_tpu.data.store import GraphStore

F_NODE, F_EDGE, F_ANGLE = 7, 5, 3


def _random_samples(rng: np.random.Generator, n_graphs: int):
    samples = []
    for i in range(n_graphs):
        n = int(rng.integers(1, 11))
        shape = rng.random()
        if shape < 0.15:
            e = 0
        elif shape < 0.45:
            e = int(rng.integers(1, n * 3 + 1))
        else:
            e = int(rng.integers(1, n * 6 + 1))
        if e and rng.random() < 0.3:
            # hub: skew in-degree so 64-group spans cluster
            dst = np.full(e, int(rng.integers(0, n)), np.int32)
            scatter = rng.random(e) < 0.4
            dst[scatter] = rng.integers(0, n, size=e,
                                        dtype=np.int32)[scatter]
        else:
            dst = rng.integers(0, n, size=e, dtype=np.int32)
        src = rng.integers(0, n, size=e, dtype=np.int32)
        if e and rng.random() < 0.6:
            l = int(rng.integers(0, e * 4 + 1))
        else:
            l = 0
        samples.append(GraphSample(
            material_id=f"rnd-{i}", formula=f"X{i}", reduced_formula=f"X{i}",
            prototype=f"p{i % 5}",
            node_feats=rng.standard_normal((n, F_NODE)).astype(np.float32),
            edge_src=src, edge_dst=dst,
            edge_attr=rng.standard_normal((e, F_EDGE)).astype(np.float32),
            lg_src=rng.integers(0, max(e, 1), size=l, dtype=np.int32),
            lg_dst=rng.integers(0, max(e, 1), size=l, dtype=np.int32),
            lg_attr=rng.standard_normal((l, F_ANGLE)).astype(np.float32),
            global_scalars=rng.standard_normal(59).astype(np.float32),
            sg_num=int(rng.integers(1, 231)),
            y=np.asarray([float(rng.uniform(10, 300)),
                          float(rng.uniform(5, 150))], np.float32)))
    return samples


def _sorted_rows(a: np.ndarray) -> np.ndarray:
    if a.size == 0:
        return a.reshape(0, a.shape[-1] if a.ndim > 1 else 1)
    a = a.reshape(a.shape[0], -1)
    return a[np.lexsort(a.T[::-1])]


def _check_batch(b, store, budget, weights):
    Np, Ep, Lp, G = b.capacity
    edge_dst = np.asarray(b.edge_dst)
    edge_src = np.asarray(b.edge_src)
    lg_dst = np.asarray(b.lg_dst)
    lg_src = np.asarray(b.lg_src)
    em = np.asarray(b.edge_mask) > 0
    lm = np.asarray(b.lg_mask) > 0
    node_graph = np.asarray(b.node_graph)
    sidx = np.asarray(b.sample_index)

    # 2) CSR layout
    assert np.all(np.diff(edge_dst) >= 0), "edge arena not dst-sorted"
    assert np.all(np.diff(lg_dst) >= 0), "lg arena not dst-sorted"
    np.testing.assert_array_equal(
        np.asarray(b.edge_row_ptr),
        np.searchsorted(edge_dst, np.arange(Np + 1)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(b.lg_row_ptr),
        np.searchsorted(lg_dst, np.arange(Ep + 1)).astype(np.int32))

    # 3) win64 bounds (verify_win64 reads budget's four fields)
    verify_win64([b], budget)
    if budget.edge_win64:
        assert measure_win64(edge_dst, Np) <= budget.edge_win64
    if budget.lg_win64:
        assert measure_win64(lg_dst, Ep) <= budget.lg_win64
    if budget.edge_src_win64:
        assert measure_seg_win64(np.asarray(b.edge_src_starts),
                                 Ep) <= budget.edge_src_win64
    if budget.lg_src_win64:
        assert measure_seg_win64(np.asarray(b.lg_src_starts),
                                 Lp) <= budget.lg_src_win64

    # masks/indices in range
    assert np.all(edge_src[em] < Np) and np.all(edge_dst[em] < Np)
    assert np.all(lg_src[lm] < Ep) and np.all(lg_dst[lm] < Ep)
    # real edges connect nodes of the same real graph
    g_of_real = node_graph[edge_dst[em]]
    assert np.all(node_graph[edge_src[em]] == g_of_real)
    assert np.all(g_of_real < G)

    # 4) dense tables are consistent bijections over real edges
    for dst, mask, in_edges, in_mask, pos, n_rows, e_cap in (
            (edge_dst, em, np.asarray(b.node_in_edges),
             np.asarray(b.node_in_mask), np.asarray(b.edge_table_pos), Np, Ep),
            (lg_dst, lm, np.asarray(b.lg_in_edges),
             np.asarray(b.lg_in_mask), np.asarray(b.lg_table_pos), Ep, Lp)):
        D = in_edges.shape[1]
        flat_e = in_edges.reshape(-1)
        flat_m = in_mask.reshape(-1) > 0
        real = np.flatnonzero(mask)
        # inverse map: each real edge's table slot holds it, under mask=1
        p = pos[real]
        assert np.all(flat_e[p] == real)
        assert np.all(flat_m[p])
        assert np.all(p // D == dst[real])
        # and nothing else is marked real
        assert int(flat_m.sum()) == real.size
        # masked-off slots carry the dummy fill (last arena slot)
        assert np.all(flat_e[~flat_m] == e_cap - 1)

    # src-sorted permutations
    for src, order, starts, n_rows in (
            (edge_src, np.asarray(b.edge_src_order),
             np.asarray(b.edge_src_starts), Np),
            (lg_src, np.asarray(b.lg_src_order),
             np.asarray(b.lg_src_starts), Ep)):
        s_sorted = src[order]
        assert np.all(np.diff(s_sorted) >= 0)
        np.testing.assert_array_equal(
            starts, np.searchsorted(s_sorted, np.arange(n_rows)
                                    ).astype(np.int32))
        assert np.array_equal(np.sort(order), np.arange(order.shape[0]))

    # 5) content conservation per real graph slot
    nodes = np.asarray(b.nodes)
    edge_attr = np.asarray(b.edge_attr)
    lg_attr = np.asarray(b.lg_attr)
    gm = np.asarray(b.graph_mask) > 0
    for g in np.flatnonzero(gm):
        s = store.sample(int(sidx[g]))
        rows = np.flatnonzero(node_graph == g)
        np.testing.assert_array_equal(_sorted_rows(nodes[rows]),
                                      _sorted_rows(s.node_feats))
        e_rows = np.flatnonzero(em & (node_graph[edge_dst] == g))
        assert e_rows.size == s.n_edges
        if s.n_edges:
            # dilution may interleave padding NODE rows (shifting batch
            # indices) but preserves per-graph node order: the local index
            # is the rank within the graph's rows
            local = np.full(Np, -1, np.int64)
            local[np.sort(rows)] = np.arange(rows.size)
            got = np.concatenate(
                [local[edge_src[e_rows]][:, None].astype(np.float32),
                 local[edge_dst[e_rows]][:, None].astype(np.float32),
                 edge_attr[e_rows]], axis=1)
            want = np.concatenate(
                [s.edge_src[:, None].astype(np.float32),
                 s.edge_dst[:, None].astype(np.float32), s.edge_attr], axis=1)
            np.testing.assert_array_equal(_sorted_rows(got),
                                          _sorted_rows(want))
        l_rows = np.flatnonzero(lm & (node_graph[edge_dst[lg_dst]] == g))
        assert l_rows.size == s.n_lg_edges
        if s.n_lg_edges:
            # bond slots are re-ordered by dilution; identify bonds by
            # their (src, dst, attr) content instead of their index
            got = np.concatenate(
                [edge_attr[lg_src[l_rows]], edge_attr[lg_dst[l_rows]],
                 lg_attr[l_rows]], axis=1)
            want = np.concatenate(
                [s.edge_attr[s.lg_src], s.edge_attr[s.lg_dst], s.lg_attr],
                axis=1)
            np.testing.assert_array_equal(_sorted_rows(got),
                                          _sorted_rows(want))
        np.testing.assert_array_equal(np.asarray(b.y)[g], s.y)
        np.testing.assert_array_equal(np.asarray(b.globals_)[g],
                                      s.global_scalars)
        assert int(np.asarray(b.sg_num)[g]) == s.sg_num
        # 6) weights ride through
        np.testing.assert_allclose(np.asarray(b.weight)[g],
                                   weights[int(sidx[g])])


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 10_000), n_graphs=st.integers(1, 18),
       batch_size=st.integers(1, 8), tighten=st.booleans(),
       unbounded=st.booleans())
# pinned fuzz finds: node dilution shifting batch indices (a test-harness
# assumption) and bond-dilution padding inflating an atom's edge span past
# edge_win64 (a real packer bug — plan_dilution returned a violating remap)
@example(seed=4, n_graphs=1, batch_size=3, tighten=True, unbounded=False)
@example(seed=10, n_graphs=7, batch_size=6, tighten=True, unbounded=False)
def test_packer_contract(seed, n_graphs, batch_size, tighten, unbounded):
    rng = np.random.default_rng(seed)
    store = GraphStore.from_samples(_random_samples(rng, n_graphs))
    idx = list(range(n_graphs))
    budget = BatchBudget.plan(store, idx, batch_size)
    if unbounded:
        budget = dataclasses.replace(budget, edge_win64=0, lg_win64=0,
                                     edge_src_win64=0, lg_src_win64=0)
    elif tighten:
        # force dilution: shrink the enforceable (dst-side) bounds toward
        # their hard floors; keep src-side bounds (assert-only) as planned
        budget = dataclasses.replace(
            budget,
            edge_win64=max(32, ((budget.max_in_degree + 128 + 31) // 32) * 32),
            lg_win64=max(32, ((budget.max_lg_in_degree + 31) // 32) * 32))
    weights = rng.uniform(0.2, 1.0, size=n_graphs).astype(np.float32)
    try:
        batches = epoch_batches(store, idx, budget, shuffle=False,
                                weights=weights)
    except ValueError:
        # a single graph genuinely cannot satisfy the tightened bounds
        assume(not tighten)
        raise
    # 1) coverage: exactly once across the epoch
    seen = np.concatenate([np.asarray(b.sample_index)[
        np.asarray(b.graph_mask) > 0] for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(n_graphs))
    for b in batches:
        _check_batch(b, store, budget, weights)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 10_000), n_graphs=st.integers(2, 10))
def test_parallel_pack_matches_contract(seed, n_graphs):
    """pack_parallel defers dilution overflow to the epoch tail instead of
    the next batch — coverage and the per-batch contract must still hold."""
    rng = np.random.default_rng(seed)
    store = GraphStore.from_samples(_random_samples(rng, n_graphs))
    idx = list(range(n_graphs))
    budget = BatchBudget.plan(store, idx, 4)
    weights = rng.uniform(0.2, 1.0, size=n_graphs).astype(np.float32)
    batches = epoch_batches(store, idx, budget, shuffle=False,
                            weights=weights, workers=3)
    seen = np.concatenate([np.asarray(b.sample_index)[
        np.asarray(b.graph_mask) > 0] for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(n_graphs))
    for b in batches:
        _check_batch(b, store, budget, weights)


def test_packing_invariance_of_model_outputs():
    """The packed layout is an internal choice: the same sample must produce
    the same (mean, logvar) regardless of which batch/budget it landed in.
    Runs the COO reference path so the check is layout-free."""
    import jax

    from gnnep_tpu.models.alignn import AlignnConfig, alignn_apply, init_alignn

    rng = np.random.default_rng(42)
    store = GraphStore.from_samples(_random_samples(rng, 12))
    idx = list(range(12))
    cfg = AlignnConfig(node_dim=F_NODE, edge_dim=F_EDGE, angle_dim=F_ANGLE,
                       global_dim=59 + 230, target_dim=2, hidden=16,
                       layers=2, heads=2, dropout=0.0, conv_impl="coo")
    params = init_alignn(jax.random.PRNGKey(0), cfg)

    def collect(batch_size, tighten):
        budget = BatchBudget.plan(store, idx, batch_size)
        if tighten:
            budget = dataclasses.replace(
                budget,
                edge_win64=max(32, ((budget.max_in_degree + 128 + 31)
                                    // 32) * 32),
                lg_win64=max(64, ((2 * budget.max_lg_in_degree + 31)
                                  // 32) * 32))
        out = {}
        for b in epoch_batches(store, idx, budget, shuffle=False):
            mean, logvar = alignn_apply(params, cfg, b)
            gm = np.asarray(b.graph_mask) > 0
            for g in np.flatnonzero(gm):
                s = int(np.asarray(b.sample_index)[g])
                out[s] = (np.asarray(mean)[g], np.asarray(logvar)[g])
        return out

    base = collect(12, False)
    assert sorted(base) == idx
    for bs, tighten in ((3, False), (5, True)):
        other = collect(bs, tighten)
        assert sorted(other) == idx
        for s in idx:
            np.testing.assert_allclose(other[s][0], base[s][0],
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(other[s][1], base[s][1],
                                       rtol=2e-5, atol=2e-6)
