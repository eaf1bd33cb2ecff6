"""Periodic neighbor finding.

Native numpy implementation of fixed-radius periodic neighbor lists
(equivalent semantics to the reference's cutoff mode,
`/root/reference/scripts/fetch.py:189-247`), plus an optional CrystalNN path
that defers to pymatgen when it is importable. Directed edges are
`(i, j, jimage)` with the convention that the neighbor's position is
`frac[j] + jimage` in fractional coordinates — identical to the bond
identity key the reference uses for line-graph construction
(fetch.py:387-398).
"""
from __future__ import annotations

import itertools
from typing import List, Tuple

import numpy as np

from .structure import Structure

Edge = Tuple[int, int, Tuple[int, int, int]]


def _image_ranges(lattice_matrix: np.ndarray, cutoff: float) -> List[int]:
    """Periodic image repeats needed per axis to cover a sphere of `cutoff`.

    Uses perpendicular interplanar spacings d_i = V / |a_j × a_k|.
    """
    vol = abs(float(np.linalg.det(lattice_matrix)))
    reps = []
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        cross = np.cross(lattice_matrix[j], lattice_matrix[k])
        d = vol / max(float(np.linalg.norm(cross)), 1e-12)
        reps.append(int(np.ceil(cutoff / max(d, 1e-12))) + 1)
    return reps


def cutoff_neighbors(structure: Structure, cutoff: float) -> List[Edge]:
    """All directed edges (i, j, jimage) with 0 < |r_ij| <= cutoff.

    Vectorized over periodic images; enumeration order is per source atom i,
    then by (image, j) lexicographic order of the candidate list, sorted by
    (j, image) for a deterministic canonical ordering.
    """
    n = len(structure)
    if n == 0:
        return []
    mat = structure.lattice.matrix
    fracs = structure.frac_coords
    reps = _image_ranges(mat, cutoff)

    from .. import native as _native

    nat = _native.cutoff_neighbors_native(fracs, mat, cutoff, reps)
    if nat is not None:
        src, dst, img, _, _ = nat
        return [(int(src[t]), int(dst[t]),
                 (int(img[t, 0]), int(img[t, 1]), int(img[t, 2])))
                for t in range(src.shape[0])]

    images = np.array(list(itertools.product(
        range(-reps[0], reps[0] + 1),
        range(-reps[1], reps[1] + 1),
        range(-reps[2], reps[2] + 1))), dtype=np.int64)  # [M, 3]

    # candidate positions: frac[j] + image, for all j, all images
    cand_frac = fracs[None, :, :] + images[:, None, :].astype(np.float64)  # [M, N, 3]
    cand_cart = cand_frac.reshape(-1, 3) @ mat                            # [M*N, 3]
    cart = structure.cart_coords

    edges: List[Edge] = []
    eps = 1e-8
    for i in range(n):
        d = np.linalg.norm(cand_cart - cart[i], axis=1)
        hit = np.nonzero((d > eps) & (d <= cutoff))[0]
        entries = []
        for flat in hit:
            m, j = divmod(int(flat), n)
            entries.append((j, tuple(int(x) for x in images[m])))
        entries.sort()
        for j, im in entries:
            edges.append((i, j, im))
    return edges


def shortest_image(structure: Structure, i: int, j: int) -> Tuple[int, int, int]:
    """Lattice translation mapping j to its nearest periodic copy w.r.t. i."""
    mat = structure.lattice.matrix
    dfrac = structure.frac_coords[j] - structure.frac_coords[i]
    base = -np.round(dfrac)
    best, best_d = (0, 0, 0), np.inf
    for delta in itertools.product((-1, 0, 1), repeat=3):
        im = base + np.asarray(delta)
        d = float(np.linalg.norm((dfrac + im) @ mat))
        if d < best_d - 1e-12:
            best_d, best = d, tuple(int(x) for x in im)
    return best


def crystalnn_neighbors(structure: Structure,
                        guess_oxidation: bool = True) -> List[Edge]:
    """CrystalNN bonded-structure edges via pymatgen (optional dependency).

    `guess_oxidation` adds guessed oxidation states first, improving
    CrystalNN bonding quality (reference fetch.py:333-339)."""
    from pymatgen.core import Lattice as PmgLattice, Structure as PmgStructure  # type: ignore
    from pymatgen.analysis.local_env import CrystalNN  # type: ignore

    pmg = PmgStructure(
        PmgLattice(structure.lattice.matrix), structure.species,
        structure.frac_coords, coords_are_cartesian=False)
    if guess_oxidation:
        try:
            pmg.add_oxidation_state_by_guess()
        except Exception:
            pass
    cnn = CrystalNN()
    sg = cnn.get_bonded_structure(pmg)
    edges: List[Edge] = []
    for i in range(len(pmg)):
        for nb in sg.get_connected_sites(i):
            j = nb.index
            im = getattr(nb, "jimage", None)
            if im is None:
                jimage = shortest_image(structure, i, j)
            else:
                jimage = (int(im[0]), int(im[1]), int(im[2]))
            edges.append((i, j, jimage))
    return edges


def find_edges(structure: Structure, method: str, cutoff: float,
               fallback_cutoff: float = 7.5,
               guess_oxidation: bool = True) -> Tuple[List[Edge], str]:
    """Dispatch on neighbor method with the reference's fallback semantics.

    'crystalnn' attempts pymatgen CrystalNN and falls back to a fixed-radius
    list at `fallback_cutoff` on any failure (including pymatgen being
    absent), mirroring fetch.py:210-247.
    """
    if method == "crystalnn":
        try:
            edges = crystalnn_neighbors(structure, guess_oxidation)
        except Exception:
            edges = []
        if edges:
            return edges, "crystalnn"
        return cutoff_neighbors(structure, fallback_cutoff), "cutoff"
    return cutoff_neighbors(structure, cutoff), "cutoff"
