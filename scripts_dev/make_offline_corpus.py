"""Generate an offline crystal corpus for end-to-end accuracy runs.

Zero-egress stand-in for a Materials Project dump (VERDICT r1 item 2: "MP
via --from-json dump if the API is unreachable"): since neither the MP API
nor a cached dump is reachable from this environment, this script builds a
physically-grounded surrogate corpus in the exact `--from-json` schema that
`gnnep_tpu.cli.fetch` ingests:

- **Structures**: 14 common prototype families (rocksalt, CsCl, zincblende,
  wurtzite, fluorite/antifluorite, perovskite, rutile, Cu3Au, NiAs, fcc,
  bcc, hcp, diamond) over real element pools, with lattice constants set
  from covalent-radius sums (touching-spheres) plus random strain/jitter —
  the same unit-cell-sized, periodic, multi-prototype population the
  reference trains on.
- **Targets**: K_VRH from a bond-stiffness model evaluated on the ACTUAL
  generated geometry — Cohen-style d^-3.5 bond term scaled by coordination,
  mixed with the Voigt mean of elemental bulk moduli, softened by ionicity
  (ΔEN) — and G_VRH = K·(Pugh-like ratio shrinking with ionicity and metal
  content). Both carry multiplicative log-normal noise (σ_ln = 0.22/0.25),
  an irreducible floor so test metrics are honest, not memorizable.
  The resulting log-target distribution approximates MP's
  (means ≈ [4.3, 3.6], stds ≈ [0.9, 0.95]; BASELINE.md constants).

This corpus demonstrates flagship-scale end-to-end training + calibration
on real hardware. It is NOT Materials Project data: accuracy numbers on it
are comparable in *kind*, not in *distribution*, to the reference's
README table — see PERF.md for the honest side-by-side.

Usage:
    python scripts_dev/make_offline_corpus.py --n 6000 --out /tmp/corpus.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gnnep_tpu.data.neighbors import cutoff_neighbors  # noqa: E402
from gnnep_tpu.data.structure import Lattice, Structure  # noqa: E402
from gnnep_tpu.elements import element_props  # noqa: E402

# Elemental bulk moduli (GPa, ambient) — public handbook values, used only
# as a composition-mixing prior for the surrogate targets.
ELEM_K = {
    "Li": 11, "Be": 130, "B": 185, "C": 33, "Na": 6.3, "Mg": 45, "Al": 76,
    "Si": 98, "P": 11, "S": 7.7, "K": 3.1, "Ca": 17, "Sc": 57, "Ti": 110,
    "V": 160, "Cr": 160, "Mn": 120, "Fe": 170, "Co": 180, "Ni": 180,
    "Cu": 140, "Zn": 70, "Ga": 56, "Ge": 75, "As": 22, "Se": 8.3, "Br": 1.9,
    "Rb": 2.5, "Sr": 12, "Y": 41, "Zr": 91, "Nb": 170, "Mo": 230, "Tc": 281,
    "Ru": 220, "Rh": 380, "Pd": 180, "Ag": 100, "Cd": 42, "In": 41,
    "Sn": 58, "Sb": 42, "Te": 65, "I": 7.7, "Cs": 1.6, "Ba": 9.6,
    "La": 28, "Ce": 22, "Pr": 29, "Nd": 32, "Sm": 38, "Gd": 38, "Dy": 41,
    "Er": 44, "Yb": 31, "Lu": 48, "Hf": 110, "Ta": 200, "W": 310,
    "Re": 370, "Os": 462, "Ir": 320, "Pt": 230, "Au": 180, "Hg": 25,
    "Tl": 43, "Pb": 46, "Bi": 31, "O": 12, "N": 10, "F": 3, "Cl": 2,
    "H": 5,
}

CATIONS = ["Li", "Na", "K", "Rb", "Cs", "Be", "Mg", "Ca", "Sr", "Ba",
           "Sc", "Y", "La", "Ti", "Zr", "Hf", "V", "Nb", "Ta", "Cr", "Mo",
           "W", "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Cd", "Al", "Ga", "In",
           "Sn", "Pb", "Ag"]
ANIONS = ["O", "S", "Se", "Te", "N", "P", "F", "Cl", "Br", "I", "C"]
METALS = ["Li", "Na", "K", "Mg", "Ca", "Sr", "Ba", "Sc", "Ti", "V", "Cr",
          "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Y", "Zr", "Nb", "Mo", "Ru",
          "Rh", "Pd", "Ag", "Cd", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt",
          "Au", "Al", "Pb", "Sn"]
COVALENT = ["C", "Si", "Ge", "Sn"]


def radius(sym: str) -> float:
    r = float(element_props(sym).radius)
    return r if r > 0 else 1.4


# ---- prototype cells: (name, species-maker, lattice-maker, frac coords) ----

def rocksalt(a):
    fr = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0],
          [.5, .5, .5], [.5, 0, 0], [0, .5, 0], [0, 0, .5]]
    return np.eye(3) * a, fr, [0, 0, 0, 0, 1, 1, 1, 1]


def cscl(a):
    return np.eye(3) * a, [[0, 0, 0], [.5, .5, .5]], [0, 1]


def zincblende(a):
    fr = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0],
          [.25, .25, .25], [.25, .75, .75], [.75, .25, .75], [.75, .75, .25]]
    return np.eye(3) * a, fr, [0, 0, 0, 0, 1, 1, 1, 1]


def wurtzite(a):
    c = a * 1.633
    mat = [[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0], [0, 0, c]]
    fr = [[1 / 3, 2 / 3, 0], [2 / 3, 1 / 3, .5],
          [1 / 3, 2 / 3, .375], [2 / 3, 1 / 3, .875]]
    return mat, fr, [0, 0, 1, 1]


def fluorite(a):
    fr = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]
    an = [[.25, .25, .25], [.25, .25, .75], [.25, .75, .25], [.75, .25, .25],
          [.75, .75, .25], [.75, .25, .75], [.25, .75, .75], [.75, .75, .75]]
    return np.eye(3) * a, fr + an, [0] * 4 + [1] * 8


def perovskite(a):
    fr = [[0, 0, 0], [.5, .5, .5], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]]
    return np.eye(3) * a, fr, [0, 1, 2, 2, 2]


def rutile(a):
    c = a * 0.644
    u = 0.305
    mat = np.diag([a, a, c])
    fr = [[0, 0, 0], [.5, .5, .5],
          [u, u, 0], [1 - u, 1 - u, 0], [.5 + u, .5 - u, .5], [.5 - u, .5 + u, .5]]
    return mat, fr, [0, 0, 1, 1, 1, 1]


def cu3au(a):
    fr = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]
    return np.eye(3) * a, fr, [1, 0, 0, 0]


def nias(a):
    c = a * 1.39
    mat = [[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0], [0, 0, c]]
    fr = [[0, 0, 0], [0, 0, .5], [1 / 3, 2 / 3, .25], [2 / 3, 1 / 3, .75]]
    return mat, fr, [0, 0, 1, 1]


def fcc(a):
    fr = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]
    return np.eye(3) * a, fr, [0] * 4


def bcc(a):
    return np.eye(3) * a, [[0, 0, 0], [.5, .5, .5]], [0, 0]


def hcp(a):
    c = a * 1.633
    mat = [[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0], [0, 0, c]]
    return mat, [[1 / 3, 2 / 3, .25], [2 / 3, 1 / 3, .75]], [0, 0]


def diamond(a):
    mat, fr, _ = zincblende(a)
    return mat, fr, [0] * 8


def en(sym: str) -> float:
    return float(element_props(sym).en) or 1.8


# Heteroscedastic mode: per-entry noise level by prototype family —
# structure-visible "difficulty" so a σ head CAN learn to rank its errors
# (the i.i.d.-noise corpus makes Spearman(|err|, σ) ≈ 0 by construction;
# VERDICT r2 item 7). Values are relative weights folded with ionicity and
# metal fraction into σ_ln ∈ [0.06, ~0.42].
PROTO_NOISE = {"rocksalt": 0.10, "cscl": 0.50, "zincblende": 0.15,
               "wurtzite": 0.40, "fluorite": 0.55, "antifluorite": 0.65,
               "perovskite": 0.70, "rutile": 0.85, "cu3au": 0.50,
               "nias": 0.95, "fcc": 0.20, "bcc": 0.30, "hcp": 0.35,
               "diamond": 0.05}


def noise_sigmas(proto: str, species: list) -> tuple:
    """(σ_ln_K, σ_ln_G) for heteroscedastic corpora: noisier for 'hard'
    prototype families, ionic compositions, and metal-rich pools."""
    ens = np.array([en(s) for s in species])
    lam = float(ens.std())
    metal_frac = float(np.mean([s in METALS for s in species]))
    w = np.clip(0.55 * PROTO_NOISE.get(proto, 0.5)
                + 0.30 * np.tanh(lam) + 0.15 * metal_frac, 0.0, 1.0)
    sig_k = 0.06 + 0.36 * float(w)
    return sig_k, 1.15 * sig_k


def target_model(structure: Structure, species: list, rng,
                 sigmas: tuple = (0.22, 0.25)) -> tuple:
    """Surrogate (K_VRH, G_VRH) from actual geometry + composition."""
    edges = cutoff_neighbors(structure, 4.2)
    if not edges:
        edges = cutoff_neighbors(structure, 6.0)
    n = len(structure)
    d_sum, cnt = 0.0, 0
    coord = np.zeros(n)
    frac = structure.frac_coords
    mat = structure.lattice.matrix
    for (i, j, im) in [(e[0], e[1], e[2]) for e in edges]:
        v = (frac[j] + np.asarray(im) - frac[i]) @ mat
        d_sum += float(np.linalg.norm(v))
        cnt += 1
        coord[i] += 1
    d_bar = d_sum / max(cnt, 1)
    z_bar = float(coord.mean())
    ens = np.array([en(s) for s in species])
    lam = float(ens.std())                      # ionicity proxy
    k_mix = float(np.mean([ELEM_K.get(s, 30.0) for s in species]))
    metal_frac = float(np.mean([s in METALS for s in species]))
    # Cohen-style covalent bond term + elemental mixing prior
    k_bond = 1400.0 / max(d_bar, 1.2) ** 3.5 * (z_bar / 6.0) ** 0.8
    k_clean = (0.65 * k_bond + 0.95 * k_mix) * (1.0 - 0.22 * np.tanh(lam))
    # Pugh-like G/K: covalent & light → high, ionic/metallic → low
    ratio = 0.52 * np.exp(-0.55 * lam) * (1.0 - 0.35 * metal_frac) + 0.125
    g_clean = k_clean * ratio
    k = k_clean * float(np.exp(rng.normal(0.0, sigmas[0])))
    g = g_clean * float(np.exp(rng.normal(0.0, sigmas[1])))
    return max(k, 1.5), max(g, 0.8), max(k_clean, 1.5), max(g_clean, 0.8)


PROTOS = [
    ("rocksalt", rocksalt, "AB"), ("cscl", cscl, "AB"),
    ("zincblende", zincblende, "AB"), ("wurtzite", wurtzite, "AB"),
    ("fluorite", fluorite, "AB2"), ("antifluorite", fluorite, "BA2"),
    ("perovskite", perovskite, "ABX3"), ("rutile", rutile, "AB2"),
    ("cu3au", cu3au, "A3B"), ("nias", nias, "AB"),
    ("fcc", fcc, "A"), ("bcc", bcc, "A"), ("hcp", hcp, "A"),
    ("diamond", diamond, "A"),
]


def _factor_reps(total: int) -> tuple:
    """Split a supercell multiplier into near-cubic (r1, r2, r3)."""
    best = (1, 1, 1)
    for r1 in range(1, 5):
        for r2 in range(r1, 5):
            for r3 in range(r2, 5):
                if r1 * r2 * r3 <= total and r1 * r2 * r3 > np.prod(best):
                    best = (r1, r2, r3)
    return best


def _supercell(mat, fr, kinds, reps) -> tuple:
    """Tile the cell by integer reps per axis."""
    r1, r2, r3 = reps
    mat = np.asarray(mat, dtype=np.float64)
    fr = np.asarray(fr, dtype=np.float64)
    offsets = np.array([[i, j, k] for i in range(r1) for j in range(r2)
                        for k in range(r3)], dtype=np.float64)
    new_fr = ((fr[None, :, :] + offsets[:, None, :])
              / np.array([r1, r2, r3])[None, None, :]).reshape(-1, 3)
    new_mat = mat * np.array([r1, r2, r3])[:, None]
    new_kinds = list(kinds) * len(offsets)
    return new_mat, new_fr, new_kinds


def mp_realize(rng, mat, fr, kinds, species, pool):
    """MP-realistic structural diversity (VERDICT r3 item 6): heavy-tailed
    unit-cell sizes via supercells (log-normal target size, median ≈ 10
    atoms, p95 ≈ 35, tail to ~110 — the padding-economics stressor SURVEY
    §7 names), substitutional disorder (mixed compositions → distinct group
    keys and realistic chemistry), and occasional vacancies."""
    base_n = len(fr)
    target_n = int(np.clip(np.exp(rng.normal(2.4, 0.85)), base_n, 110))
    mult = max(1, target_n // base_n)
    if mult > 1:
        mat, fr, kinds = _supercell(mat, fr, kinds, _factor_reps(mult))
    fr = np.asarray(fr, dtype=np.float64)
    species = [pool[min(k, len(pool) - 1)] for k in kinds]

    # substitutional disorder: swap a random fraction of one species class
    if len(species) >= 4 and rng.random() < 0.35:
        tgt = str(rng.choice(sorted(set(species))))
        sites = [i for i, s in enumerate(species) if s == tgt]
        n_sub = max(1, int(len(sites) * rng.uniform(0.05, 0.25)))
        sub_pool = CATIONS if tgt in CATIONS else (
            ANIONS if tgt in ANIONS else METALS)
        repl = str(rng.choice([e for e in sub_pool if e != tgt]))
        for i in rng.choice(sites, size=min(n_sub, len(sites)),
                            replace=False):
            species[int(i)] = repl

    # vacancy: drop one site from larger cells
    if len(species) >= 6 and rng.random() < 0.12:
        drop = int(rng.integers(len(species)))
        fr = np.delete(fr, drop, axis=0)
        species = species[:drop] + species[drop + 1:]
    return mat, fr, species


def make_entry(idx: int, rng, hetero: bool = False,
               mp_real: bool = False) -> dict:
    name, maker, kind = PROTOS[rng.integers(len(PROTOS))]
    if kind == "A":
        a_el = str(rng.choice(COVALENT if name == "diamond" else METALS))
        pool = [a_el]
        a0 = 2.0 * radius(a_el) * (1.55 if name in ("fcc", "hcp") else 1.35
                                   if name == "bcc" else 1.85)
    elif kind == "ABX3":
        a_el = str(rng.choice(["Ca", "Sr", "Ba", "K", "Na", "La", "Pb"]))
        b_el = str(rng.choice(["Ti", "Zr", "Nb", "Ta", "Mn", "Fe", "Sn", "Hf"]))
        x_el = str(rng.choice(["O", "O", "O", "F", "Cl"]))
        pool = [a_el, b_el, x_el]
        a0 = 2.0 * (radius(b_el) + radius(x_el)) * 0.98
    else:
        a_el = str(rng.choice(CATIONS))
        b_el = str(rng.choice(ANIONS if rng.random() < 0.75 else METALS))
        if b_el == a_el:
            b_el = "O"
        pool = [b_el, a_el] if kind == "BA2" else [a_el, b_el]
        rsum = radius(pool[0]) + radius(pool[-1])
        scale = {"rocksalt": 2.0, "cscl": 2.0 / np.sqrt(3) * 2, "zincblende":
                 4 / np.sqrt(3), "wurtzite": 1.63, "fluorite": 4 / np.sqrt(3),
                 "antifluorite": 4 / np.sqrt(3), "rutile": 2.05,
                 "cu3au": 2.0, "nias": 1.95}.get(name, 2.0)
        a0 = rsum * scale * 0.95
    a0 *= float(1.0 + rng.normal(0, 0.035))     # strain diversity
    mat, fr, kinds = maker(a0)
    if mp_real:
        mat, fr, species = mp_realize(rng, mat, fr, kinds, None, pool)
    else:
        species = [pool[min(k, len(pool) - 1)] for k in kinds]
    fr = np.asarray(fr, dtype=np.float64)
    fr = fr + rng.normal(0, 0.004, fr.shape)    # site jitter
    s = Structure(Lattice(np.asarray(mat, dtype=np.float64)), species, fr)
    sig = noise_sigmas(name, species) if hetero else (0.22, 0.25)
    k, g, k_clean, g_clean = target_model(s, species, rng, sigmas=sig)
    comp: dict = {}
    for sp in species:
        comp[sp] = comp.get(sp, 0) + 1
    formula = "".join(f"{e}{c if c > 1 else ''}" for e, c in sorted(comp.items()))
    entry = {
        "material_id": f"off-{idx:06d}",
        "formula": formula,
        "prototype_family": name,
        "k_vrh": round(k, 4),
        "g_vrh": round(g, 4),
        "structure": s.as_dict(),
    }
    if hetero:  # generator-side truth, for post-hoc σ-quality analysis only
        entry["noise_sigma_k"], entry["noise_sigma_g"] = (round(sig[0], 4),
                                                          round(sig[1], 4))
        # clean (pre-noise) targets: let reports compute the exact
        # irreducible noise floor instead of a Monte-Carlo estimate
        entry["k_clean"], entry["g_clean"] = (round(k_clean, 4),
                                              round(g_clean, 4))
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="/tmp/offline_corpus.json")
    ap.add_argument("--hetero", action="store_true",
                    help="structure-dependent noise levels (σ-quality runs)")
    ap.add_argument("--mp-real", action="store_true",
                    help="MP-realistic population: heavy-tailed supercell "
                         "sizes, substitutional disorder, vacancies")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    entries = [make_entry(i, rng, hetero=args.hetero, mp_real=args.mp_real)
               for i in range(args.n)]
    ks = np.array([e["k_vrh"] for e in entries])
    gs = np.array([e["g_vrh"] for e in entries])
    sizes = np.array([len(e["structure"]["sites"]) for e in entries])
    print(f"n={len(entries)}  log-K mean/std = {np.log(ks).mean():.3f}/"
          f"{np.log(ks).std():.3f}  log-G mean/std = {np.log(gs).mean():.3f}/"
          f"{np.log(gs).std():.3f}")
    print(f"cell sizes: median={np.median(sizes):.0f} p95="
          f"{np.percentile(sizes, 95):.0f} max={sizes.max()}")
    Path(args.out).write_text(json.dumps({"materials": entries}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
