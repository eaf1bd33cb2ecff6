"""Giant-graph end-to-end story (VERDICT r4 item 2): a single graph that
exceeds the batch budget — which the packer rejects with a hard ValueError —
trains and predicts through the boundary-exchange edge partition when
`giant_graphs='boundary'` is set, on the virtual CPU mesh.

The giant here is a ~5,500-atom supercell (43,904 bonds / 307,328 line-graph
angles) in a population of 2-atom cells, the exact case SURVEY.md:361-367
prescribes edge partitioning for.
"""
import math

import jax
import numpy as np
import pytest

from gnnep_tpu.data.batching import BatchBudget, epoch_batches
from gnnep_tpu.data.featurize import BasisConfig, build_graph
from gnnep_tpu.data.store import GraphStore
from gnnep_tpu.data.structure import Lattice, Structure
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import prepare, run_training

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

BASIS = BasisConfig(rbf_n=4, rbf_cutoff=4.0, angle_n=4)


def _small(i: int, rng):
    a = 3.0 + 0.12 * (i % 5)
    s = Structure(Lattice(np.eye(3) * a), ["Si", "Si"],
                  [[0, 0, 0], [0.5, 0.5, 0.5]])
    return build_graph(s, material_id=f"small-{i}",
                       y=[80.0 + 5 * i + rng.normal(0, 2),
                          40.0 + 3 * i + rng.normal(0, 1)],
                       basis=BASIS, nn_method="cutoff", cutoff=a * 0.9,
                       prototype=f"proto_{i}", sg_num=(i % 20) + 1)


def _giant(n: int, mid: str, proto: str, y):
    """n×n×n supercell of a 2-atom cubic cell → 2n³ atoms."""
    a = 3.1
    lat = Lattice(np.eye(3) * a * n)
    species, coords = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                for base in ([0, 0, 0], [0.5, 0.5, 0.5]):
                    species.append("Si")
                    coords.append([(i + base[0]) / n, (j + base[1]) / n,
                                   (k + base[2]) / n])
    s = Structure(lat, species, coords)
    return build_graph(s, material_id=mid, y=y, basis=BASIS,
                       nn_method="cutoff", cutoff=a * 0.9, prototype=proto,
                       sg_num=1)


@pytest.fixture(scope="module")
def mixed_store():
    rng = np.random.default_rng(0)
    samples = [_small(i, rng) for i in range(20)]
    samples.append(_giant(14, "giant-big", "proto_giant_a", [95.0, 47.0]))
    samples.append(_giant(5, "giant-med", "proto_giant_b", [88.0, 44.0]))
    return GraphStore.from_samples(samples)


@pytest.mark.slow
class TestGiantGraphs:
    def test_packer_rejects_giant_without_routing(self, mixed_store):
        """The pre-existing behavior this feature replaces: a typical-stats
        budget cannot hold the giant and the packer raises."""
        small_idx = list(range(20))
        budget = BatchBudget.plan(mixed_store, small_idx, 4,
                                  cover_all=False)
        with pytest.raises(ValueError, match="exceeds batch budget"):
            epoch_batches(mixed_store, [20], budget, shuffle=False)

    def test_prepare_routes_giants(self, mixed_store):
        cfg = TrainConfig(batch_size=4, hidden=16, layers=1, heads=2,
                          ensemble_size=1, giant_graphs="boundary",
                          edge_shards=4, verbose=False)
        setup = prepare(cfg, mixed_store)
        assert setup.giant is not None
        assert setup.giant.indices == [20, 21]
        assert setup.giant.plan.n_shards == 4
        # the re-planned budget stays typical-sized: the giant's 43,904-bond
        # arena must NOT balloon every batch (that is the feature's point)
        assert setup.budget.n_edges < 4000
        # boundary partition actually cuts the giant: nonzero exchange
        assert setup.giant.plan.bn > 0 and setup.giant.plan.bl > 0

    def test_giant_trains_and_predicts_boundary(self, mixed_store, tmp_path):
        """run_training with giant routing: the ~5.5k-atom graph takes real
        boundary optimizer steps (train split), its predictions flow into
        calibration/test, and Ensemble.predict serves it via the boundary
        forward."""
        from gnnep_tpu.infer.predict import Ensemble

        cfg = TrainConfig(batch_size=4, hidden=16, layers=1, heads=2,
                          epochs=1, ensemble_size=1, bootstrap=False,
                          giant_graphs="boundary", edge_shards=4,
                          val_frac=0.15, calib_frac=0.15, test_frac=0.15,
                          early_stop=5, scan_steps=0, verbose=False,
                          save_dir=str(tmp_path / "ens"))
        setup = prepare(cfg, mixed_store)
        in_train = [g for g in setup.giant.indices if g in setup.train_idx]
        assert in_train, (
            "fixture seed must place at least one giant in the train split "
            f"(train={setup.train_idx})")
        summary = run_training(cfg, mixed_store)
        assert math.isfinite(summary["test_stats"]["overall"]["mae"])

        ens = Ensemble.load(tmp_path / "ens")
        std_store = ens.scaler.apply(mixed_store)
        rows = ens.predict(std_store, [20, 0, 21], batch_size=4,
                           giant_shards=4)
        by_id = {r["material_id"]: r for r in rows}
        assert set(by_id) == {"giant-big", "giant-med", "small-0"}
        for r in rows:
            assert all(math.isfinite(v) for v in r["mu"])
            assert all(v >= 0.0 for v in r["sigma"])

        # the evaluate pipeline routes giants too: the giant-containing
        # split evaluates through the boundary forward instead of a
        # cover-all budget ballooned to the giant's arenas, and produces
        # the same metrics (same math, partitioned layout)
        from gnnep_tpu.evaluate.runner import EvalConfig, run_evaluation

        base = dict(ensemble_dir=str(tmp_path / "ens"), batch_size=4,
                    seed=cfg.seed, val_frac=0.15, calib_frac=0.15,
                    test_frac=0.15, ensemble_size=1, eval_split="train",
                    make_plots=False)
        routed = run_evaluation(EvalConfig(
            output_dir=str(tmp_path / "eval_routed"), giant_shards=4,
            **base), mixed_store)
        cover = run_evaluation(EvalConfig(
            output_dir=str(tmp_path / "eval_cover"), giant_shards=0,
            **base), mixed_store)
        assert math.isfinite(routed["overall"]["mae"])
        np.testing.assert_allclose(routed["overall"]["mae"],
                                   cover["overall"]["mae"], rtol=1e-3)
        np.testing.assert_allclose(routed["overall"]["rmse"],
                                   cover["overall"]["rmse"], rtol=1e-3)

    def test_boundary_predictions_match_unpartitioned(self, mixed_store):
        """The boundary forward on the giant agrees with the single-device
        forward over a covering budget (same math, partitioned layout)."""
        from gnnep_tpu.models.alignn import init_alignn
        from gnnep_tpu.parallel.giant import (build_giant_set,
                                              collect_giant_predictions)
        from gnnep_tpu.parallel.mesh import make_mesh
        from gnnep_tpu.parallel.train_step import cached_boundary_forward
        from gnnep_tpu.train.ensemble import model_config
        from gnnep_tpu.train.loop import collect_predictions, make_forward

        cfg = TrainConfig(batch_size=4, hidden=16, layers=1, heads=2,
                          ensemble_size=1, verbose=False)
        setup = prepare(cfg, mixed_store)
        mc = model_config(cfg, setup.store)
        params = init_alignn(jax.random.PRNGKey(0), mc)

        gset = build_giant_set(setup.store, [21], 4)
        mesh = make_mesh(1, 4, devices=jax.devices()[:4])
        fwd = cached_boundary_forward(mesh, mc, -2.9, gset.plan)
        gm, gs, gy, gi = collect_giant_predictions(fwd, gset, [21], params, 1)

        cover = BatchBudget.plan(setup.store, [21], 1)
        batches = epoch_batches(setup.store, [21], cover, shuffle=False)
        sm, ss, sy, si = collect_predictions(make_forward(mc, -2.9), params,
                                             batches)
        np.testing.assert_allclose(gm, sm, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(gs, ss, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(gy, sy)
        assert list(gi) == [21] and list(si) == [21]

        # the serving fast path reaches the giant route too: the bf16
        # boundary forward tracks its own f32 result within bf16 tolerance
        fwd16 = cached_boundary_forward(mesh, mc, -2.9, gset.plan,
                                        compute_dtype="bfloat16")
        hm, hs, hy, hi = collect_giant_predictions(fwd16, gset, [21],
                                                   params, 1)
        assert np.isfinite(hm).all() and (hs > 0).all()
        np.testing.assert_allclose(hm, gm, atol=5e-2)
        np.testing.assert_allclose(np.log(hs), np.log(gs), atol=5e-2)
        np.testing.assert_allclose(hy, gy)
        assert list(hi) == [21]

    def test_classify_fixpoint_catches_hidden_giants(self, mixed_store):
        """The shared fixpoint (parallel/giant.classify_giants, used by
        train's prepare() AND evaluate/predict): the ~5.5k-atom giant
        inflates the typical-stats capacity enough that a single
        find_giants pass misses the 250-atom giant — which would then
        balloon the cover-all budget the routing exists to protect."""
        from gnnep_tpu.parallel.giant import classify_giants, find_giants

        pop = list(range(mixed_store.n_graphs))
        plan = lambda p, ca: BatchBudget.plan(mixed_store, p, 4,
                                              cover_all=ca)
        # the hazard: one pass over the full population flags ONLY the big
        # giant (its arena inflates the mean-based capacity past the medium
        # one) — this is what evaluate/predict used to do
        assert find_giants(mixed_store, pop, plan(pop, False)) == [20]
        normal, giants, budget = classify_giants(mixed_store, pop, plan)
        assert giants == [20, 21]
        assert normal == list(range(20))        # order-preserving
        # final budget: cover-all over the normal population, giant-free
        # statistics (a typical 2-atom-cell batch, not a 43,904-bond arena)
        assert budget.n_edges < 4000
        for g in normal:
            e = mixed_store.counts(g)[1]
            assert e <= budget.n_edges - 1

    def test_collect_empty_ids_matches_target_dim(self, mixed_store):
        """collect_giant_predictions' empty-ids rows must carry the store's
        real target width (was hardcoded to 2)."""
        from gnnep_tpu.parallel.giant import (build_giant_set,
                                              collect_giant_predictions)

        gset = build_giant_set(mixed_store, [21], 2)
        m, s, y, i = collect_giant_predictions(None, gset, [], None, 1)
        t = mixed_store.target_dim
        assert m.shape == (0, t) and s.shape == (0, t) and y.shape == (0, t)
        assert i.shape == (0,)
