"""Native (C++) vs pure-Python parity for the graph-pipeline kernels."""
import numpy as np
import pytest

from gnnep_tpu import native
from gnnep_tpu.data.featurize import BasisConfig, build_graph, _line_graph_python
from gnnep_tpu.data.neighbors import _image_ranges
from gnnep_tpu.data.structure import Lattice, Structure

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C++ toolchain")


def _random_structure(seed, n=6, a=4.5):
    rng = np.random.default_rng(seed)
    mat = np.eye(3) * a + rng.normal(0, 0.4, (3, 3))
    species = list(rng.choice(["Si", "O", "Fe", "Mg"], n))
    return Structure(Lattice(mat), [str(s) for s in species], rng.random((n, 3)))


@needs_native
class TestNativeParity:
    def test_cutoff_neighbors_match_python(self):
        for seed in range(4):
            s = _random_structure(seed)
            mat = s.lattice.matrix
            reps = _image_ranges(mat, 4.0)
            nat = native.cutoff_neighbors_native(s.frac_coords, mat, 4.0, reps)
            assert nat is not None
            src, dst, img, dist, dirs = nat
            # independent python recomputation (the pre-native implementation)
            import itertools
            images = np.array(list(itertools.product(
                range(-reps[0], reps[0] + 1), range(-reps[1], reps[1] + 1),
                range(-reps[2], reps[2] + 1))))
            want = []
            cart = s.cart_coords
            cand = (s.frac_coords[None, :, :] + images[:, None, :]) \
                .reshape(-1, 3) @ mat
            n = len(s)
            for i in range(n):
                d = np.linalg.norm(cand - cart[i], axis=1)
                hit = np.nonzero((d > 1e-8) & (d <= 4.0))[0]
                entries = sorted((int(f) % n, tuple(int(x) for x in images[int(f) // n]))
                                 for f in hit)
                want.extend((i, j, im) for j, im in entries)
            got = [(int(src[t]), int(dst[t]), tuple(int(x) for x in img[t]))
                   for t in range(len(src))]
            assert got == want
            # distances & unit dirs consistent
            for t in range(len(src)):
                v = (s.frac_coords[dst[t]] + img[t] - s.frac_coords[src[t]]) @ mat
                assert abs(np.linalg.norm(v) - dist[t]) < 1e-9
                np.testing.assert_allclose(dirs[t] * dist[t], v, atol=1e-9)

    def test_line_graph_matches_python(self):
        basis = BasisConfig(rbf_n=6, rbf_cutoff=5.0, angle_n=5)
        for seed in range(4):
            s = _random_structure(seed)
            mat = s.lattice.matrix
            reps = _image_ranges(mat, 4.0)
            nat = native.cutoff_neighbors_native(s.frac_coords, mat, 4.0, reps)
            src, dst, img, dist, dirs = nat
            edges = [(int(src[t]), int(dst[t]), tuple(int(x) for x in img[t]))
                     for t in range(len(src))]
            got = native.build_line_graph_native(
                src, dst, img, dirs, len(s), basis.angle_centers,
                basis.angle_gamma_value)
            want = _line_graph_python(edges, src, dst, img, dirs,
                                      basis.angle_centers, basis.angle_gamma_value)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
            np.testing.assert_allclose(got[2], want[2], rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(got[3], want[3], rtol=1e-9, atol=1e-12)

    def test_plan_dilution_matches_python(self, rng):
        from gnnep_tpu import native
        from gnnep_tpu.data import batching

        if not native.available():
            import pytest

            pytest.skip("no C++ toolchain")
        for trial in range(20):
            n = int(rng.integers(1, 400))
            counts = rng.integers(0, 30, n).astype(np.int64)
            bound = int(rng.integers(40, 200))
            cap = int(rng.integers(n + 2, 2 * n + 130))
            nat = native.plan_dilution_native(counts, bound, cap)
            # reference: the pure-Python loop (bypass the native dispatch)
            pos, acc = 0, 0
            py = np.empty(n, np.int64)
            ok = True
            for t in range(n):
                c = int(counts[t])
                if acc + c > bound and pos % 64:
                    pos = ((pos // 64) + 1) * 64
                    acc = 0
                if pos >= cap - 1:
                    ok = False
                    break
                py[t] = pos
                acc += c
                pos += 1
                if pos % 64 == 0:
                    acc = 0
            if not ok:
                assert nat is None, f"trial {trial}: native should overflow"
            else:
                assert nat is not None
                np.testing.assert_array_equal(nat, py)

    def test_build_batch_tables_matches_python(self, rng):
        from gnnep_tpu.data.batching import (build_incoming_table,
                                             csr_row_ptrs, src_csr_index)

        for trial in range(12):
            Np = int(rng.integers(4, 160))
            Ep = int(rng.integers(4, 1500))
            Lp = int(rng.integers(4, 6000))
            edge_dst = rng.integers(0, Np, Ep).astype(np.int32)
            lg_dst = rng.integers(0, Ep, Lp).astype(np.int32)
            if trial % 2 == 0:   # the packed-arena case: dst-sorted
                edge_dst = np.sort(edge_dst).astype(np.int32)
                lg_dst = np.sort(lg_dst).astype(np.int32)
            edge_src = rng.integers(0, Np, Ep).astype(np.int32)
            edge_mask = (rng.random(Ep) > 0.2).astype(np.float32)
            lg_src = rng.integers(0, Ep, Lp).astype(np.int32)
            lg_mask = (rng.random(Lp) > 0.2).astype(np.float32)
            caps = [int(np.bincount(k[m > 0], minlength=n).max(initial=0))
                    + int(rng.integers(0, 3)) or 1
                    for k, m, n in [(edge_dst, edge_mask, Np),
                                    (lg_dst, lg_mask, Ep),
                                    (edge_src, edge_mask, Np),
                                    (lg_src, lg_mask, Ep)]]
            out = native.build_batch_tables_native(
                edge_src, edge_dst, edge_mask, lg_src, lg_dst, lg_mask,
                Np, *caps)
            assert out is not None
            eo2, es2 = src_csr_index(edge_src, Np)
            lo2, ls2 = src_csr_index(lg_src, Ep)
            want = [*build_incoming_table(edge_dst, edge_mask, Np, caps[0], Ep - 1),
                    *build_incoming_table(lg_dst, lg_mask, Ep, caps[1], Lp - 1),
                    *build_incoming_table(edge_src, edge_mask, Np, caps[2],
                                          Ep - 1, order=eo2)[:2],
                    *build_incoming_table(lg_src, lg_mask, Ep, caps[3],
                                          Lp - 1, order=lo2)[:2],
                    eo2, es2, lo2, ls2]
            for got, ref in zip(out[:14], want):
                assert got.dtype == ref.dtype
                np.testing.assert_array_equal(got, ref)
            if trial % 2 == 0:  # row pointers only defined on sorted arenas
                erp2, lrp2 = csr_row_ptrs(edge_dst, lg_dst, Np, Ep)
                np.testing.assert_array_equal(out[14], erp2)
                np.testing.assert_array_equal(out[15], lrp2)
            # capacity overflow → None (caller falls back to the Python
            # diagnostic path)
            real_deg = int(np.bincount(edge_dst[edge_mask > 0],
                                       minlength=Np).max(initial=0))
            if real_deg > 1:
                small = native.build_batch_tables_native(
                    edge_src, edge_dst, edge_mask, lg_src, lg_dst, lg_mask,
                    Np, real_deg - 1, caps[1], caps[2], caps[3])
                assert small is None

    def test_assemble_arenas_matches_python(self, rng):
        # whole-batch packing with the native assembler equals the pure
        # Python packer bit-for-bit on every GraphBatch field
        import synthetic as synth
        from gnnep_tpu.data.batching import BatchBudget, BatchPacker

        store = synth.make_store(n=12, seed=11)
        idx = list(range(12))
        budget = BatchBudget.plan(store, idx, 4)
        nat = list(BatchPacker(store, budget).pack(idx))
        lib, failed = native._lib, native._lib_failed
        try:
            native._lib, native._lib_failed = None, True
            py = list(BatchPacker(store, budget).pack(idx))
        finally:
            native._lib, native._lib_failed = lib, failed
        assert len(nat) == len(py) and len(nat) > 0
        for bn, bp in zip(nat, py):
            for name in bn._fields:
                a, b = getattr(bn, name), getattr(bp, name)
                assert a.dtype == b.dtype and a.shape == b.shape, name
                np.testing.assert_array_equal(a, b, err_msg=name)

    def test_assemble_arenas_out_of_budget_falls_back(self):
        # fail-loud parity with the Python path: graphs that exceed the
        # arena budgets must return None (caller falls back to the raising
        # numpy assembly) instead of memcpy-ing past the allocated arenas
        import synthetic as synth

        store = synth.make_store(n=6, seed=5)
        ids = list(range(6))
        n_tot = int(store.node_off[-1])
        e_tot = int(store.edge_off[-1])
        l_tot = int(store.lg_off[-1])
        ok = native.assemble_arenas_native(store, ids, n_tot + 8,
                                           e_tot + 8, l_tot + 8, 8)
        assert ok is not None
        for Np, Ep, Lp in [(n_tot - 1, e_tot + 8, l_tot + 8),
                           (n_tot + 8, e_tot - 1, l_tot + 8),
                           (n_tot + 8, e_tot + 8, l_tot - 1)]:
            assert native.assemble_arenas_native(store, ids, Np, Ep, Lp,
                                                 8) is None

    def test_build_graph_uses_native_consistently(self):
        # end-to-end: the sample built with native kernels equals the one
        # built with the python fallback
        s = _random_structure(7)
        basis = BasisConfig(rbf_n=6, rbf_cutoff=5.0, angle_n=5)
        g_native = build_graph(s, nn_method="cutoff", cutoff=4.0, basis=basis)
        try:
            native._lib_failed = True   # force fallback
            lib = native._lib
            native._lib = None
            g_py = build_graph(s, nn_method="cutoff", cutoff=4.0, basis=basis)
        finally:
            native._lib_failed = False
            native._lib = lib
        np.testing.assert_array_equal(g_native.edge_src, g_py.edge_src)
        np.testing.assert_array_equal(g_native.lg_src, g_py.lg_src)
        np.testing.assert_array_equal(g_native.lg_dst, g_py.lg_dst)
        np.testing.assert_allclose(g_native.lg_attr, g_py.lg_attr, rtol=1e-6,
                                   atol=1e-7)
        np.testing.assert_allclose(g_native.global_scalars, g_py.global_scalars,
                                   rtol=1e-5, atol=1e-6)
