"""Property fuzz of the boundary-exchange plan over random graph batches.

Complements tests/test_boundary_shard.py's parametrized cases with
randomized shapes: for ANY packed batch and shard count, the plan must
partition exactly (every real edge once), keep slots inside the arena, and
round-trip the global (src, dst) edge lists through the local windows + slot
maps — the invariant a silent mis-slotting (wrong owner / send position /
local offset) would break.
"""
import numpy as np
import pytest

from gnnep_tpu.parallel.boundary_shard import plan_boundary
from gnnep_tpu.utils.synth import synthetic_batch

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _cases(draw):
    seed = draw(st.integers(0, 10_000))
    n_graphs = draw(st.integers(1, 4))
    mean_atoms = draw(st.integers(6, 60))
    degree = draw(st.integers(2, 8))
    n_shards = draw(st.sampled_from([2, 4, 8]))
    return seed, n_graphs, mean_atoms, degree, n_shards


@settings(max_examples=40, deadline=None)
@given(case=_cases())
def test_plan_round_trips_random_batches(case):
    seed, n_graphs, mean_atoms, degree, n_shards = case
    b = synthetic_batch(np.random.default_rng(seed), n_graphs=n_graphs,
                        mean_atoms=mean_atoms, degree=degree, node_dim=8,
                        edge_dim=6, angle_dim=5, global_dim=59,
                        table_cap=24, lg_table_cap=40)
    if np.asarray(b.nodes).shape[0] % n_shards:
        return  # arena not divisible by this shard count — out of contract
    bb, plan = plan_boundary(b, n_shards)
    S, rn, bn, bl, e_loc = (plan.n_shards, plan.rn, plan.bn, plan.bl,
                            plan.e_loc)

    # exact partition of the real edges
    assert float(np.asarray(bb.a_mask).sum()) == \
        float(np.asarray(b.edge_mask).sum())
    assert float(np.asarray(bb.l_mask).sum()) == \
        float(np.asarray(b.lg_mask).sum())
    # slots stay inside the (own ‖ recv ‖ dummy) arenas
    assert (np.asarray(bb.a_src_slot) < plan.a_arena).all()
    assert (np.asarray(bb.l_src_slot) < plan.l_arena).all()
    assert plan.a_arena % 128 == 0 and plan.l_arena % 128 == 0

    # atom-level round trip
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
                src_g = int(n_send[t, s * bn + pos]) + t * rn
            got.add((src_g, dst_g))
    em = np.asarray(b.edge_mask) > 0
    want = set(zip(np.asarray(b.edge_src)[em].tolist(),
                   np.asarray(b.edge_dst)[em].tolist()))
    assert got == want

    # LG-level round trip
    got_l = set()
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
            got_l.add((src_g, dst_g))
    lm = np.asarray(b.lg_mask) > 0
    want_l = set(zip(np.asarray(b.lg_src)[lm].tolist(),
                     np.asarray(b.lg_dst)[lm].tolist()))
    assert got_l == want_l
