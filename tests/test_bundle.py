"""AOT serving bundle tests: export → load → serve round trip.

The bundle's deserialized program must produce the exact `make_forward`
numerics (`infer/bundle.py`; same program, AOT-serialized), and the CLI
must drive the full export/predict cycle.
"""
import json
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gnnep_tpu.infer.bundle import ServingBundle, export_bundle
from gnnep_tpu.infer.predict import Ensemble
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import run_training

from synthetic import make_store


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("bundle_ens")
    store = make_store(20, seed=11)
    cfg = TrainConfig(save_dir=str(d), batch_size=6, epochs=2, hidden=16,
                      layers=1, heads=2, ensemble_size=2, seed=42,
                      val_frac=0.15, calib_frac=0.15, test_frac=0.15,
                      bootstrap=False, feature_jitter_std=0.0, verbose=False)
    run_training(cfg, store)
    return d, store


@pytest.mark.slow
class TestServingBundle:
    def test_export_load_predict_matches_ensemble(self, trained, tmp_path):
        ens_dir, store = trained
        out = tmp_path / "serving"
        meta = export_bundle(ens_dir, store, out, batch_size=6)
        assert meta["platform"] == jax.default_backend()
        assert (out / "meta.json").exists()
        assert (out / "forward_0.bin").exists()
        # homogeneous members share ONE exported program
        assert max(meta["member_programs"]) == 0
        assert len(meta["member_programs"]) == 2

        bundle = ServingBundle.load(out)
        ens = Ensemble.load(ens_dir)
        std = ens.scaler.apply(store)
        idx = [3, 0, 7, 12]
        got = bundle.predict(std, idx)
        ref = ens.predict(std, idx, batch_size=6)
        assert [r["material_id"] for r in got] == \
            [r["material_id"] for r in ref]
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g["mu"], r["mu"], rtol=1e-5,
                                       atol=1e-6)
            np.testing.assert_allclose(g["sigma"], r["sigma"], rtol=1e-5,
                                       atol=1e-6)

    def test_bundle_is_self_contained_and_rejects_oversize(self, trained,
                                                           tmp_path):
        ens_dir, store = trained
        out = tmp_path / "serving"
        export_bundle(ens_dir, store, out, batch_size=6)
        # loads with NO reference back to the original ensemble dir
        bundle = ServingBundle.load(out)
        assert bundle.budget.n_graphs >= 6
        # a graph bigger than the recorded arenas is a loud packer error
        big = make_store(30, seed=12)
        std = bundle.ensemble.scaler.apply(big)
        import dataclasses

        shrunk = dataclasses.replace(bundle.budget, n_edges=9, n_nodes=9)
        bundle.budget = shrunk
        with pytest.raises(ValueError):
            bundle.predict(std, list(range(10)))

    def test_cli_export_then_predict(self, trained, tmp_path, capsys):
        ens_dir, store = trained
        from gnnep_tpu.cli.bundle import main

        # the CLI loads the dataset from disk — persist the fixture store
        from gnnep_tpu.data.store import save_sample
        from synthetic import make_samples

        data_dir = tmp_path / "data"
        for s in make_samples(20, seed=11):
            save_sample(data_dir, s)

        out = tmp_path / "serving"
        main(["export", "--ensemble-dir", str(ens_dir),
              "--data-dir", str(data_dir), "--out", str(out),
              "--batch-size", "6"])
        pred_json = tmp_path / "preds.json"
        main(["predict", "--bundle-dir", str(out),
              "--data-dir", str(data_dir), "--num-samples", "3",
              "--output-json", str(pred_json)])
        preds = json.loads(pred_json.read_text())["predictions"]
        assert len(preds) == 3
        for p in preds:
            assert all(math.isfinite(v) for v in p["mu"])
            assert all(v >= 0.0 for v in p["sigma"])

    def test_cli_predict_custom_input(self, trained, tmp_path):
        # dataset-free serving: a NEW structure through the pre-compiled
        # program via the custom-inference JSON schema (neighbor settings
        # chosen so the graph fits the bundle's packing contract — an
        # over-dense custom graph is a loud packer error by design)
        from gnnep_tpu.cli.bundle import main

        ens_dir, store = trained
        out = tmp_path / "serving"
        export_bundle(ens_dir, store, out, batch_size=6)
        custom = {"materials": [{
            "material_id": "custom-si",
            "formula": "Si2",
            "nn_method": "cutoff", "cutoff": 2.7,
            "k_vrh": 90.0, "g_vrh": 45.0,
            "structure": {
                "lattice": {"matrix": [[3.1, 0, 0], [0, 3.1, 0],
                                       [0, 0, 3.1]]},
                "sites": [
                    {"species": [{"element": "Si"}],
                     "abc": [0.0, 0.0, 0.0]},
                    {"species": [{"element": "Si"}],
                     "abc": [0.5, 0.5, 0.5]},
                ],
            },
        }]}
        in_json = tmp_path / "custom.json"
        in_json.write_text(json.dumps(custom))
        pred_json = tmp_path / "custom_preds.json"
        main(["predict", "--bundle-dir", str(out),
              "--input-file", str(in_json),
              "--output-json", str(pred_json)])
        preds = json.loads(pred_json.read_text())["predictions"]
        assert len(preds) == 1
        assert preds[0]["material_id"] == "custom-si"
        assert all(math.isfinite(v) for v in preds[0]["mu"])
