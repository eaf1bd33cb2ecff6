"""The pymatgen-dependent featurization branches, executed via a fake pymatgen.

pymatgen is absent in this environment, so the reference's *default*
featurization glue (CrystalNN neighbors `/root/reference/scripts/fetch.py:
189-247`, SpacegroupAnalyzer one-hot `fetch.py:117-129`, the StructureMatcher
prototype cascade `fetch.py:159-186`) would otherwise never run. A minimal
fake pymatgen injected through sys.modules drives each branch and asserts the
glue: the oxidation-guess call, jimage extraction with the shortest-image
fallback, the symprec handed to the analyzer, and the get_structure_type
cascade.
"""
import sys
import types

import numpy as np
import pytest

from gnnep_tpu.data.neighbors import crystalnn_neighbors, find_edges, shortest_image
from gnnep_tpu.data.structure import Lattice, Structure


def _rocksalt(a=4.2):
    return Structure(Lattice(np.eye(3) * a), ["Na", "Cl"],
                     [[0, 0, 0], [0.5, 0.5, 0.5]])


class _Recorder:
    def __init__(self):
        self.oxidation_calls = 0
        self.analyzer_args = []
        self.built_structures = []


def _install_fake_pymatgen(monkeypatch, rec, *, bonds=None, sg_number=225,
                           structure_type=None, analyzer_raises=False):
    """Install fake pymatgen.core / analysis.local_env / symmetry.analyzer /
    analysis.structure_matcher modules. `bonds[i]` lists (j, jimage-or-None)
    neighbor entries returned for site i. `pymatgen.core` deliberately lacks
    `Composition`, so formula code keeps exercising the native path."""

    class FakeLattice:
        def __init__(self, matrix):
            self.matrix = np.asarray(matrix, dtype=np.float64)

    class FakeStructure:
        def __init__(self, lattice, species, frac_coords,
                     coords_are_cartesian=False):
            assert coords_are_cartesian is False
            self.lattice = lattice
            self.species = list(species)
            self.frac_coords = np.asarray(frac_coords, dtype=np.float64)
            rec.built_structures.append(self)

        def add_oxidation_state_by_guess(self):
            rec.oxidation_calls += 1

        def __len__(self):
            return len(self.species)

        @classmethod
        def from_dict(cls, d):
            return cls(FakeLattice(d["lattice"]["matrix"]),
                       [s["species"][0]["element"] for s in d["sites"]],
                       [s["abc"] for s in d["sites"]])

    class FakeBondedGraph:
        def __init__(self, bond_table):
            self._bonds = bond_table

        def get_connected_sites(self, i):
            out = []
            for j, im in self._bonds.get(i, []):
                ns = types.SimpleNamespace(index=j)
                if im is not None:
                    ns.jimage = im
                # im=None → no jimage attr → caller must use shortest_image
                out.append(ns)
            return out

    class FakeCrystalNN:
        def get_bonded_structure(self, pmg):
            if bonds is None:
                raise RuntimeError("CrystalNN failure injected")
            return FakeBondedGraph(bonds)

    class FakeSpacegroupAnalyzer:
        def __init__(self, structure, symprec=0.1):
            rec.analyzer_args.append((structure, symprec))
            if analyzer_raises:
                raise ValueError("symmetry analysis failure injected")

        def get_space_group_number(self):
            return sg_number

    class FakeStructureMatcher:
        def __init__(self, **kwargs):
            self.kwargs = kwargs

    if structure_type is not None:
        def get_structure_type(self, s):
            return structure_type
        FakeStructureMatcher.get_structure_type = get_structure_type

    core = types.ModuleType("pymatgen.core")
    core.Lattice = FakeLattice
    core.Structure = FakeStructure
    analysis = types.ModuleType("pymatgen.analysis")
    local_env = types.ModuleType("pymatgen.analysis.local_env")
    local_env.CrystalNN = FakeCrystalNN
    matcher_mod = types.ModuleType("pymatgen.analysis.structure_matcher")
    matcher_mod.StructureMatcher = FakeStructureMatcher
    symmetry = types.ModuleType("pymatgen.symmetry")
    analyzer_mod = types.ModuleType("pymatgen.symmetry.analyzer")
    analyzer_mod.SpacegroupAnalyzer = FakeSpacegroupAnalyzer
    root = types.ModuleType("pymatgen")
    root.core = core
    root.analysis = analysis
    root.symmetry = symmetry
    analysis.local_env = local_env
    analysis.structure_matcher = matcher_mod
    symmetry.analyzer = analyzer_mod
    for name, mod in (("pymatgen", root), ("pymatgen.core", core),
                      ("pymatgen.analysis", analysis),
                      ("pymatgen.analysis.local_env", local_env),
                      ("pymatgen.analysis.structure_matcher", matcher_mod),
                      ("pymatgen.symmetry", symmetry),
                      ("pymatgen.symmetry.analyzer", analyzer_mod)):
        monkeypatch.setitem(sys.modules, name, mod)


# symmetric CrystalNN-style bond table for the 2-atom rocksalt cell; the
# (1, 0, None) entry exercises the shortest_image fallback path
_BONDS = {
    0: [(1, (0, 0, 0)), (1, (0, 0, -1)), (1, (0, -1, 0)), (1, (-1, 0, 0))],
    1: [(0, None), (0, (0, 0, 1)), (0, (0, 1, 0)), (0, (1, 0, 0))],
}


class TestCrystalnnGlue:
    def test_edges_and_jimage_extraction(self, monkeypatch):
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS)
        s = _rocksalt()
        edges = crystalnn_neighbors(s, guess_oxidation=True)
        assert rec.oxidation_calls == 1
        # the conversion handed pymatgen our exact lattice/species/coords
        built = rec.built_structures[0]
        np.testing.assert_allclose(built.lattice.matrix, s.lattice.matrix)
        assert built.species == ["Na", "Cl"]
        # jimage attrs pass through verbatim; the attr-less neighbor resolves
        # via shortest_image (fetch.py:250-263 semantics)
        expect_fallback = shortest_image(s, 1, 0)
        expected = ([(0, j, im) for j, im in _BONDS[0]]
                    + [(1, 0, expect_fallback)]
                    + [(1, j, im) for j, im in _BONDS[1][1:]])
        assert edges == expected

    def test_no_oxidation_guess(self, monkeypatch):
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS)
        crystalnn_neighbors(_rocksalt(), guess_oxidation=False)
        assert rec.oxidation_calls == 0

    def test_find_edges_crystalnn_success(self, monkeypatch):
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS)
        edges, used = find_edges(_rocksalt(), "crystalnn", cutoff=5.0)
        assert used == "crystalnn"
        assert len(edges) == 8

    def test_find_edges_crystalnn_failure_falls_back(self, monkeypatch):
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=None)  # CNN raises
        s = _rocksalt()
        edges, used = find_edges(s, "crystalnn", cutoff=5.0,
                                 fallback_cutoff=7.5)
        assert used == "cutoff"
        from gnnep_tpu.data.neighbors import cutoff_neighbors
        assert edges == cutoff_neighbors(s, 7.5)


class TestSpacegroupGlue:
    def test_analyzer_number_and_symprec(self, monkeypatch):
        from gnnep_tpu.data.featurize import spacegroup_number
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS, sg_number=225)
        s = _rocksalt()
        assert spacegroup_number(s) == 225
        built, symprec = rec.analyzer_args[0]
        assert symprec == pytest.approx(1e-2)   # fetch.py:117-129 default
        np.testing.assert_allclose(built.lattice.matrix, s.lattice.matrix)

    def test_analyzer_failure_yields_zero(self, monkeypatch):
        from gnnep_tpu.data.featurize import spacegroup_number
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS,
                               analyzer_raises=True)
        assert spacegroup_number(_rocksalt()) == 0


class TestPrototypeCascade:
    def test_structure_matcher_type_wins(self, monkeypatch):
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS,
                               structure_type="rocksalt")
        assert _rocksalt().prototype_label() == "rocksalt"

    def test_without_get_structure_type_anonymized(self, monkeypatch):
        # modern pymatgen dropped get_structure_type; the cascade must land
        # on the anonymized formula exactly as the reference guard does
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS)
        s = _rocksalt()
        assert s.prototype_label() == s.anonymized_formula() == "AB"


class TestEndToEndFakePmg:
    def test_build_graph_crystalnn_branch(self, monkeypatch):
        """build_graph's default (crystalnn) path end-to-end under the fake:
        neighbor_method records 'crystalnn' and sg_num flows from the
        analyzer — the reference-default featurization executed at last."""
        from gnnep_tpu.data.featurize import BasisConfig, build_graph
        rec = _Recorder()
        _install_fake_pymatgen(monkeypatch, rec, bonds=_BONDS, sg_number=221)
        sample = build_graph(_rocksalt(), material_id="fake-1",
                             basis=BasisConfig(rbf_n=4, angle_n=4),
                             nn_method="crystalnn")
        assert sample.neighbor_method == "crystalnn"
        assert sample.sg_num == 221
        assert sample.edge_src.shape[0] == 8
        assert np.isfinite(sample.edge_attr).all()
        assert np.isfinite(sample.lg_attr).all()
        assert sample.prototype == "AB"
