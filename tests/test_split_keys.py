"""Adversarial split-key battery (VERDICT r3 item 4).

`group_key = "{prototype}|{reduced_formula}"` decides split membership
(`/root/reference/scripts/train.py:1303-1309`); one divergent composition
class vs pymatgen's `Composition.reduced_formula` silently reshuffles splits
and invalidates every MAE comparison. pymatgen is not installed here, so this
battery pins two independent layers:

1. a GOLDEN table over the most common MP chemistry classes (rocksalts,
   oxides, spinels, sulfates/phosphates/carbonates with and without polyanion
   grouping, perovskites, mixed-valence cuprates, hydrates, hydrides,
   peroxide/diatomic special formulas) — hand-derived from pymatgen's
   published `reduce_formula` algorithm (pymatgen/core/composition.py) and,
   where well-known, cross-checked against Materials Project formula_pretty
   strings;
2. a hypothesis fuzz of the repo implementation against an INDEPENDENT
   test-local transcription of that algorithm over randomized compositions.

Known divergence classes are documented at the bottom.
"""
import math

import numpy as np
import pytest

from gnnep_tpu.data.structure import Lattice, Structure
from gnnep_tpu.elements import element_props

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


def _structure_of(sym_amt):
    species = []
    for sym, count in sym_amt.items():
        species.extend([sym] * int(count))
    n = len(species)
    fracs = np.linspace(0, 0.9, n)[:, None] * np.ones((1, 3))
    return Structure(Lattice(np.eye(3) * 20.0), species, fracs)


# ---------------------------------------------------------------------------
# independent transcription of pymatgen reduce_formula (composition.py)
# ---------------------------------------------------------------------------

_SPECIAL = {
    "LiO": "Li2O2", "NaO": "Na2O2", "KO": "K2O2", "HO": "H2O2", "CsO": "Cs2O2",
    "RbO": "Rb2O2", "O": "O2", "N": "N2", "F": "F2", "Cl": "Cl2", "H": "H2",
}


def _en(sym):
    return float(element_props(sym).en)


def _fmt(amt: float) -> str:
    if amt == 1:
        return ""
    if abs(amt - int(amt)) < 1e-8:
        return str(int(amt))
    return str(round(amt, 8))


def _ref_reduce(sym_amt):
    syms = sorted(sym_amt, key=lambda s: (_en(s), s))
    syms = [s for s in syms if abs(sym_amt[s]) > 1e-8]
    factor = 1
    if all(int(v) == v for v in sym_amt.values()):
        factor = abs(math.gcd(*(int(v) for v in sym_amt.values())))
    poly = []
    if len(syms) >= 3 and _en(syms[-1]) - _en(syms[-2]) < 1.65:
        pa = {syms[i]: sym_amt[syms[i]] / factor for i in (-2, -1)}
        pform, pfac = _ref_reduce(pa)
        if pfac != 1:
            poly.append(f"({pform}){pfac:.0f}")
    syms = syms[: len(syms) - 2 if poly else len(syms)]
    parts = []
    for s in syms:
        parts.append(s + _fmt(sym_amt[s] / factor))
    return "".join(parts + poly), factor


def _ref_reduced_formula(sym_amt):
    formula, _ = _ref_reduce(sym_amt)
    return _SPECIAL.get(formula, formula)


def _ref_anonymized(sym_amt):
    counts = [int(v) for v in sym_amt.values()]
    g = math.gcd(*counts)
    amounts = sorted(c / g for c in counts)
    out = []
    for letter, amt in zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", amounts):
        out.append(letter + ("" if amt == 1 else
                             str(int(amt)) if abs(amt % 1) < 1e-8 else str(amt)))
    return "".join(out)


# ---------------------------------------------------------------------------
# golden battery: the common MP chemistry classes
# ---------------------------------------------------------------------------

GOLDEN = [
    # (composition, reduced_formula, anonymized_formula)
    ({"Na": 4, "Cl": 4}, "NaCl", "AB"),                       # rocksalt
    ({"Fe": 2, "O": 3}, "Fe2O3", "A2B3"),                     # sesquioxide
    ({"Fe": 3, "O": 4}, "Fe3O4", "A3B4"),                     # mixed valence
    ({"Mn": 3, "O": 4}, "Mn3O4", "A3B4"),
    ({"Mg": 1, "Al": 2, "O": 4}, "MgAl2O4", "AB2C4"),         # spinel (no poly: EN gap 1.83)
    ({"Fe": 2, "S": 3, "O": 12}, "Fe2(SO4)3", "A2B3C12"),     # polyanion grouped
    ({"Ca": 3, "P": 2, "O": 8}, "Ca3(PO4)2", "A2B3C8"),       # polyanion grouped
    ({"Ca": 1, "C": 1, "O": 3}, "CaCO3", "ABC3"),             # poly factor 1 → ungrouped
    ({"Ca": 1, "Mg": 1, "C": 2, "O": 6}, "CaMg(CO3)2", "ABC2D6"),  # dolomite
    ({"K": 2, "S": 1, "O": 4}, "K2SO4", "AB2C4"),
    ({"Na": 3, "P": 1, "O": 4}, "Na3PO4", "AB3C4"),
    ({"Na": 2, "C": 1, "O": 3}, "Na2CO3", "AB2C3"),
    ({"Na": 1, "H": 1, "C": 1, "O": 3}, "NaHCO3", "ABCD3"),
    ({"Li": 1, "Fe": 1, "P": 1, "O": 4}, "LiFePO4", "ABCD4"),
    ({"Li": 1, "Co": 1, "O": 2}, "LiCoO2", "ABC2"),
    ({"Ba": 1, "Ti": 1, "O": 3}, "BaTiO3", "ABC3"),           # perovskite
    ({"Sr": 1, "Ti": 1, "O": 3}, "SrTiO3", "ABC3"),
    ({"Y": 1, "Ba": 2, "Cu": 3, "O": 7}, "Ba2YCu3O7", "AB2C3D7"),  # cuprate: EN order ≠ input order
    ({"K": 2, "Cr": 2, "O": 7}, "K2Cr2O7", "A2B2C7"),         # EN(O)-EN(Cr)=1.78 → ungrouped
    ({"Ga": 1, "As": 1}, "GaAs", "AB"),
    ({"Si": 1, "C": 1}, "SiC", "AB"),
    ({"Zn": 1, "S": 1}, "ZnS", "AB"),
    ({"Ti": 1, "O": 2}, "TiO2", "AB2"),
    ({"Al": 2, "O": 3}, "Al2O3", "A2B3"),
    ({"Si": 1, "O": 2}, "SiO2", "AB2"),
    ({"Si": 3, "N": 4}, "Si3N4", "A3B4"),
    ({"W": 1, "C": 1}, "WC", "AB"),
    ({"Ti": 1, "N": 1}, "TiN", "AB"),
    ({"Cu": 2, "O": 1}, "Cu2O", "AB2"),
    ({"Fe": 1, "S": 2}, "FeS2", "AB2"),
    ({"Bi": 2, "Te": 3}, "Bi2Te3", "A2B3"),
    ({"Ga": 1, "N": 1}, "GaN", "AB"),
    ({"Mg": 1, "B": 2}, "MgB2", "AB2"),
    ({"H": 2, "O": 1}, "H2O", "AB2"),
    ({"Li": 4, "O": 4}, "Li2O2", "AB"),                       # peroxide special formula
    ({"Na": 2, "O": 2}, "Na2O2", "AB"),
    ({"O": 8}, "O2", "A"),                                    # diatomic special
    ({"N": 2}, "N2", "A"),
    # hydride (superhydride class)
    ({"La": 1, "H": 10}, "LaH10", "AB10"),
    # hydrate: CuSO4·5H2O — algorithm-derived (EN sort interleaves H
    # between Cu and S; poly pair (S,O) has factor 1 so stays ungrouped)
    ({"Cu": 1, "S": 1, "O": 9, "H": 10}, "CuH10SO9", "ABC9D10"),
    # hydroxide: algorithm-derived "(HO)2" — the inner polyanion sort is
    # EN-ascending, H before O
    ({"Mg": 1, "O": 2, "H": 2}, "Mg(HO)2", "AB2C2"),
    ({"K": 2, "Pt": 1, "Cl": 6}, "K2PtCl6", "AB2C6"),         # halide complex
    ({"Cs": 2, "Pb": 1, "I": 6}, "Cs2PbI6", "AB2C6"),
    ({"N": 2, "H": 4, "O": 3}, "H4N2O3", "A2B3C4"),           # NH4NO3 by EN order
    ({"Po": 3}, "Po", "A"),                                   # single element
]


class TestGoldenKeys:
    @pytest.mark.parametrize("comp,reduced,anon", GOLDEN,
                             ids=[g[1] for g in GOLDEN])
    def test_golden(self, comp, reduced, anon):
        s = _structure_of(comp)
        assert s.reduced_formula() == reduced
        assert s.anonymized_formula() == anon
        # prototype cascade without pymatgen = anonymized formula, and the
        # group key is "{prototype}|{reduced_formula}"
        assert s.prototype_label() == anon

    @pytest.mark.parametrize("comp,reduced,anon", GOLDEN,
                             ids=[g[1] for g in GOLDEN])
    def test_transcription_agrees_on_goldens(self, comp, reduced, anon):
        # the independent transcription must reproduce every golden too —
        # if both implementations agree here AND under fuzz, a divergence
        # from real pymatgen would have to be in the shared understanding
        # of the published algorithm, not in either implementation
        assert _ref_reduced_formula({k: float(v) for k, v in comp.items()}) \
            == reduced
        assert _ref_anonymized(comp) == anon


# fuzz pool: diverse EN spread incl. alkali/alkaline-earth, transition
# metals, metalloids, chalcogens/halogens, H — the elements of ~95 % of the
# MP elasticity set
_POOL = ["H", "Li", "Be", "B", "C", "N", "O", "F", "Na", "Mg", "Al", "Si",
         "P", "S", "Cl", "K", "Ca", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni",
         "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Rb", "Sr", "Y", "Zr",
         "Nb", "Mo", "Ag", "Cd", "In", "Sn", "Sb", "Te", "I", "Cs", "Ba",
         "La", "Hf", "Ta", "W", "Pt", "Au", "Pb", "Bi"]


@st.composite
def _compositions(draw):
    n_el = draw(st.integers(1, 5))
    syms = draw(st.lists(st.sampled_from(_POOL), min_size=n_el, max_size=n_el,
                         unique=True))
    counts = draw(st.lists(st.integers(1, 16), min_size=n_el, max_size=n_el))
    return dict(zip(syms, counts))


class TestFuzzVsTranscription:
    @settings(max_examples=400, deadline=None)
    @given(comp=_compositions())
    def test_reduced_formula_matches(self, comp):
        s = _structure_of(comp)
        expect = _ref_reduced_formula({k: float(v) for k, v in comp.items()})
        assert s.reduced_formula() == expect

    @settings(max_examples=400, deadline=None)
    @given(comp=_compositions())
    def test_anonymized_matches(self, comp):
        s = _structure_of(comp)
        assert s.anonymized_formula() == _ref_anonymized(comp)

    @settings(max_examples=200, deadline=None)
    @given(comp=_compositions())
    def test_site_order_invariance(self, comp):
        """Split keys must not depend on site enumeration order."""
        s1 = _structure_of(comp)
        rev = dict(reversed(list(comp.items())))
        s2 = _structure_of(rev)
        assert s1.reduced_formula() == s2.reduced_formula()
        assert s1.anonymized_formula() == s2.anonymized_formula()


# Known divergence classes vs real pymatgen (documented, per VERDICT item 4):
# - noble-gas compositions: pymatgen's EN is NaN there (sorts unpredictably);
#   the repo maps missing EN to 0.0. Absent from elasticity data.
# - fractional site occupancies: the native Structure takes the majority-
#   occupancy species per site, so compositions are always integral; real
#   pymatgen on a disordered Structure would carry fractional amounts and
#   fall back to the UNREDUCED formula string. MP elasticity docs are
#   ordered structures, so fetch never hits this.
# - deuterium/tritium labels ("D", "T"): not in the element table; pymatgen
#   treats them as hydrogen isotopes. MP uses "H" in structures.
