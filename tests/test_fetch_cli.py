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


def _fake_pmg_structure(i):
    """Duck-typed pymatgen Structure for `_structure_from_doc` (the shape the
    reference smoke fabricates, /root/reference/tests/smoke.py:45-53)."""
    from types import SimpleNamespace

    a = 3.0 + 0.1 * i
    site = lambda sym: SimpleNamespace(specie=SimpleNamespace(symbol=sym))
    return SimpleNamespace(
        lattice=SimpleNamespace(matrix=np.eye(3) * a),
        sites=[site("Si"), site("Si")],
        frac_coords=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]))


def _fake_docs():
    from types import SimpleNamespace

    docs = []
    for i in range(4):
        # doc 1 carries dict-valued VRH fields (the tolerant-coercion path);
        # doc 3 is missing its shear modulus entirely (y=None, still saved)
        if i == 1:
            k, g = {"vrh": 101.0}, {"voigt": 63.0, "reuss": 57.0}
        elif i == 3:
            k, g = 80.0, None
        else:
            k, g = 90.0 + i, 50.0 + i
        docs.append(SimpleNamespace(
            material_id=f"mp-{i:04d}", formula_pretty="Si2",
            structure=_fake_pmg_structure(i),
            bulk_modulus=k, shear_modulus=g))
    return docs


def _install_fake_mp_api(monkeypatch, docs, calls):
    """A fake `mp_api.client.MPRester` injected via sys.modules, recording
    every `summary.search` invocation's kwargs."""
    import types

    class MPRester:
        def __init__(self, api_key):
            calls.append(("init", api_key))
            self.materials = types.SimpleNamespace(
                summary=types.SimpleNamespace(search=self._search))

        def _search(self, fields=None, num_chunks=None, chunk_size=None,
                    **filters):
            calls.append(("search", dict(fields=fields, num_chunks=num_chunks,
                                         chunk_size=chunk_size, **filters)))
            if num_chunks is None:           # --all: streaming generator
                return iter(docs)
            return list(docs)[:num_chunks * chunk_size]

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    client = types.ModuleType("mp_api.client")
    client.MPRester = MPRester
    mp_api = types.ModuleType("mp_api")
    mp_api.client = client
    monkeypatch.setitem(sys.modules, "mp_api", mp_api)
    monkeypatch.setitem(sys.modules, "mp_api.client", client)


class TestMockedMpFetch:
    """The live-fetch code path (`cli/fetch.py:66-112`) under a fake MPRester
    — paging, --all streaming, dict-tolerant VRH coercion, and pymatgen-doc
    structure conversion, none of which --from-json exercises."""

    def _run_main(self, monkeypatch, out_dir, argv):
        from gnnep_tpu.cli.fetch import main
        monkeypatch.setenv("MAPI_KEY", "fake-key-123")
        main(["--out-dir", str(out_dir), "--nn-method", "cutoff",
              "--cutoff", "3.0", "--rbf-n", "4", "--angle-n", "4",
              "--disable-mat2vec"] + argv)

    def test_limited_fetch_pages_and_coerces(self, tmp_path, monkeypatch):
        calls = []
        _install_fake_mp_api(monkeypatch, _fake_docs(), calls)
        self._run_main(monkeypatch, tmp_path / "out",
                       ["--limit", "3", "--page-size", "2"])
        assert calls[0] == ("init", "fake-key-123")
        kind, kw = calls[1]
        assert kind == "search"
        # paging: ceil(3/2) chunks of 2; elasticity filters as the reference
        # sends them (fetch.py:674-699)
        assert kw["num_chunks"] == 2 and kw["chunk_size"] == 2
        assert kw["has_props"] == ["elasticity"]
        assert kw["k_vrh"] == (0.0, float("inf"))
        assert kw["g_vrh"] == (0.0, float("inf"))
        assert set(kw["fields"]) >= {"material_id", "structure",
                                     "bulk_modulus", "shear_modulus"}
        store = GraphStore.load_dir(tmp_path / "out", require_target=False,
                                    use_cache=False)
        # 4 docs returned by the fake, --limit slices to 3
        assert store.n_graphs == 3
        byid = {m: i for i, m in enumerate(store.material_ids)}
        # dict-tolerant coercion: {"vrh": ...} preferred, else first numeric
        np.testing.assert_allclose(store.y[byid["mp-0001"]], [101.0, 63.0])
        np.testing.assert_allclose(store.y[byid["mp-0000"]], [90.0, 50.0])
        # structure conversion: 2 Si sites, cubic cell edge 3.0 → 6 features
        s0 = store.sample(byid["mp-0000"])
        assert s0.n_nodes == 2 and s0.node_feats.shape[1] == 6

    def test_all_streams_and_keeps_untargeted(self, tmp_path, monkeypatch):
        calls = []
        _install_fake_mp_api(monkeypatch, _fake_docs(), calls)
        self._run_main(monkeypatch, tmp_path / "out", [])   # --all default
        kind, kw = calls[1]
        assert kw["num_chunks"] is None     # streaming, not paged
        store = GraphStore.load_dir(tmp_path / "out", require_target=False,
                                    use_cache=False)
        assert store.n_graphs == 4
        byid = {m: i for i, m in enumerate(store.material_ids)}
        # the doc with a missing shear modulus is saved without a target
        assert not np.isfinite(store.y[byid["mp-0003"]]).all()
        assert store.has_target().sum() == 3

    def test_missing_api_key_exits(self, tmp_path, monkeypatch):
        monkeypatch.delenv("MAPI_KEY", raising=False)
        monkeypatch.delenv("MP_API_KEY", raising=False)
        from gnnep_tpu.cli.fetch import main
        with __import__("pytest").raises(SystemExit, match="API key"):
            main(["--out-dir", str(tmp_path / "o"), "--limit", "1"])
