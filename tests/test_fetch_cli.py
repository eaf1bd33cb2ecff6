"""Offline fetch CLI: --from-json source, resume, parallel featurization."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(Path(__file__).parent))

from gnnep_tpu.data.store import GraphStore  # noqa: E402
from gnnep_tpu.data.structure import Lattice, Structure  # noqa: E402


def _entries(n=6):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        a = 3.0 + 0.1 * i
        s = Structure(Lattice(np.eye(3) * a), ["Si", "Si"],
                      [[0, 0, 0], [0.5, 0.5, 0.5]])
        out.append({"material_id": f"mp-{i:04d}", "formula": "Si2",
                    "structure": s.as_dict(),
                    "k_vrh": float(80 + 10 * rng.random()),
                    "g_vrh": float(40 + 5 * rng.random())})
    return out


def _run_fetch(tmp_path, out_dir, extra):
    src = tmp_path / "structures.json"
    if not src.exists():
        src.write_text(json.dumps(_entries()))
    r = subprocess.run(
        [sys.executable, "-m", "gnnep_tpu.cli.fetch",
         "--out-dir", str(out_dir), "--from-json", str(src),
         "--nn-method", "cutoff", "--cutoff", "2.9",
         "--rbf-n", "4", "--angle-n", "4", "--disable-mat2vec"] + extra,
        capture_output=True, text=True, cwd=REPO,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, f"fetch failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r.stdout


class TestFetchCli:
    def test_from_json_serial_and_parallel_match(self, tmp_path):
        out_s = tmp_path / "serial"
        out_p = tmp_path / "parallel"
        _run_fetch(tmp_path, out_s, [])
        _run_fetch(tmp_path, out_p, ["--fetch-workers", "2"])
        a = GraphStore.load_dir(out_s, require_target=False, use_cache=False)
        b = GraphStore.load_dir(out_p, require_target=False, use_cache=False)
        assert a.material_ids == b.material_ids and a.n_graphs == 6
        np.testing.assert_allclose(a.node_feats, b.node_feats)
        np.testing.assert_allclose(a.edge_attr, b.edge_attr)
        np.testing.assert_allclose(a.lg_attr, b.lg_attr)
        np.testing.assert_allclose(a.y, b.y)
        assert (out_p / "index.json").exists()

    def test_skip_existing_resume(self, tmp_path):
        out = tmp_path / "resume"
        _run_fetch(tmp_path, out, [])
        stdout = _run_fetch(tmp_path, out, ["--skip-existing"])
        assert "skipped: 6" in stdout
