"""End-to-end smoke test: synthetic dataset → train CLI → predict CLI.

Mirrors the reference's integration strategy (`/root/reference/tests/smoke.py`
— synthetic structures through the real pipeline, then subprocess-driven
CLIs), and additionally exercises the custom-inference mode the reference
writes fixtures for but never runs (SURVEY.md §4).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from gnnep_tpu.data.store import save_sample
from gnnep_tpu.data.structure import Lattice, Structure

from synthetic import make_samples

REPO = Path(__file__).resolve().parent.parent


def _run(cmd, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run([sys.executable, *cmd], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_cli_train_then_predict(tmp_path):
    data_dir = tmp_path / "data"
    for s in make_samples(16, seed=9):
        save_sample(data_dir, s)
    save_dir = tmp_path / "ensemble"

    r = _run(["-m", "gnnep_tpu.cli.train",
              "--data-dir", str(data_dir), "--save-dir", str(save_dir),
              "--epochs", "2", "--ensemble-size", "2", "--hidden", "16",
              "--layers", "1", "--heads", "1", "--batch-size", "8",
              "--val-frac", "0.15", "--calib-frac", "0.15", "--test-frac", "0.15",
              "--no-bootstrap-train", "--feature-jitter-std", "0",
              "--freq-bins", "1", "--quiet"], cwd=REPO)
    assert r.returncode == 0, f"train failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert (save_dir / "model_1.npz").exists()
    assert (save_dir / "conformal.json").exists()

    # random mode
    r = _run(["-m", "gnnep_tpu.cli.predict", "--mode", "random",
              "--ensemble-dir", str(save_dir), "--data-dir", str(data_dir),
              "--num-samples", "3",
              "--output-json", str(tmp_path / "preds.json")], cwd=REPO)
    assert r.returncode == 0, f"predict failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    preds = json.loads((tmp_path / "preds.json").read_text())["predictions"]
    assert len(preds) == 3
    assert all(len(p["mu"]) == 2 and p["ci90"][0]["lower"] >= 0 for p in preds)

    # materials mode
    r = _run(["-m", "gnnep_tpu.cli.predict", "--mode", "materials",
              "--ensemble-dir", str(save_dir), "--data-dir", str(data_dir),
              "--materials", "mp-0001,mp-0003"], cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mp-0001" in r.stdout and "mp-0003" in r.stdout

    # custom mode: structure dict + raw-array entry
    s = Structure(Lattice(np.eye(3) * 3.1), ["Si", "Si"],
                  [[0, 0, 0], [0.5, 0.5, 0.5]])
    custom = {"materials": [
        {"material_id": "custom-structure", "structure": s.as_dict(),
         "nn_method": "cutoff", "cutoff": 2.9, "k_vrh": 95.0, "g_vrh": 60.0},
    ]}
    custom_file = tmp_path / "custom.json"
    custom_file.write_text(json.dumps(custom))
    r = _run(["-m", "gnnep_tpu.cli.predict", "--mode", "custom",
              "--ensemble-dir", str(save_dir), "--input-file", str(custom_file),
              "--output-json", str(tmp_path / "custom_preds.json")], cwd=REPO)
    assert r.returncode == 0, f"custom predict failed:\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}"
    cp = json.loads((tmp_path / "custom_preds.json").read_text())["predictions"]
    assert cp[0]["material_id"] == "custom-structure"
    assert cp[0]["target"] == [95.0, 60.0]

    # the SHIPPED example input must run as-is (basis inferred from the
    # checkpoint, sg overrides honored, mixed with/without targets)
    r = _run(["-m", "gnnep_tpu.cli.predict", "--mode", "custom",
              "--ensemble-dir", str(save_dir),
              "--input-file", str(REPO / "examples" / "custom_materials.json"),
              "--output-json", str(tmp_path / "example_preds.json")], cwd=REPO)
    assert r.returncode == 0, f"example predict failed:\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}"
    ep = json.loads((tmp_path / "example_preds.json").read_text())["predictions"]
    ids = {p["material_id"] for p in ep}
    assert {"example-MgO", "example-Si", "example-GaAs"} <= ids
