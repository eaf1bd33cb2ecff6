"""Native crystal-structure container and lattice math.

A minimal, numpy-only stand-in for the subset of `pymatgen.core.Structure`
the featurization layer needs (the reference leans on pymatgen throughout
`/root/reference/scripts/fetch.py`): lattice vectors, fractional coords,
species symbols, volume/density, and parsing of pymatgen's
`Structure.as_dict()` JSON format (the custom-inference input schema,
reference `predict.py:402-440`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence

import numpy as np

from ..elements import element_props

_AMU_PER_A3_TO_G_PER_CM3 = 1.66053906660  # 1 amu/Å³ in g/cm³


@dataclasses.dataclass(frozen=True)
class Lattice:
    """Row-vector lattice: cartesian = frac @ matrix."""

    matrix: np.ndarray  # [3, 3] float64, rows are a, b, c

    def __post_init__(self):
        object.__setattr__(self, "matrix", np.asarray(self.matrix, dtype=np.float64).reshape(3, 3))

    @property
    def lengths(self) -> np.ndarray:
        return np.linalg.norm(self.matrix, axis=1)

    @property
    def a(self) -> float:
        return float(self.lengths[0])

    @property
    def b(self) -> float:
        return float(self.lengths[1])

    @property
    def c(self) -> float:
        return float(self.lengths[2])

    def _angle(self, i: int, j: int) -> float:
        u, v = self.matrix[i], self.matrix[j]
        cosang = np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        return math.degrees(math.acos(float(np.clip(cosang, -1.0, 1.0))))

    @property
    def alpha(self) -> float:  # angle between b and c
        return self._angle(1, 2)

    @property
    def beta(self) -> float:  # angle between a and c
        return self._angle(0, 2)

    @property
    def gamma(self) -> float:  # angle between a and b
        return self._angle(0, 1)

    @property
    def volume(self) -> float:
        return float(abs(np.linalg.det(self.matrix)))

    def cartesian(self, frac: np.ndarray) -> np.ndarray:
        return np.asarray(frac, dtype=np.float64) @ self.matrix

    @classmethod
    def from_parameters(cls, a: float, b: float, c: float,
                        alpha: float, beta: float, gamma: float) -> "Lattice":
        """Standard crystallographic construction (a along x, b in xy-plane)."""
        ar, br, gr = (math.radians(x) for x in (alpha, beta, gamma))
        cx = c * math.cos(br)
        cy = c * (math.cos(ar) - math.cos(br) * math.cos(gr)) / max(math.sin(gr), 1e-12)
        cz = math.sqrt(max(c * c - cx * cx - cy * cy, 0.0))
        m = np.array([
            [a, 0.0, 0.0],
            [b * math.cos(gr), b * math.sin(gr), 0.0],
            [cx, cy, cz],
        ])
        return cls(m)


@dataclasses.dataclass
class Structure:
    """Periodic crystal: lattice + species symbols + fractional coordinates."""

    lattice: Lattice
    species: List[str]           # element symbols, may carry oxidation suffixes
    frac_coords: np.ndarray      # [N, 3] float64

    def __post_init__(self):
        self.frac_coords = np.asarray(self.frac_coords, dtype=np.float64).reshape(-1, 3)
        if len(self.species) != self.frac_coords.shape[0]:
            raise ValueError(
                f"species ({len(self.species)}) and frac_coords ({self.frac_coords.shape[0]}) disagree")

    def __len__(self) -> int:
        return len(self.species)

    @property
    def cart_coords(self) -> np.ndarray:
        return self.lattice.cartesian(self.frac_coords)

    @property
    def volume(self) -> float:
        return self.lattice.volume

    @property
    def total_mass(self) -> float:
        return float(sum(element_props(s).mass for s in self.species))

    @property
    def density(self) -> float:
        """g/cm³ (matches pymatgen's Structure.density)."""
        vol = self.volume
        if vol <= 0:
            return 0.0
        return self.total_mass / vol * _AMU_PER_A3_TO_G_PER_CM3

    @property
    def composition(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for s in self.species:
            core = "".join(ch for ch in s if ch.isalpha())
            out[core] = out.get(core, 0) + 1
        return out

    def reduced_formula(self) -> str:
        """Alphabetized reduced formula, e.g. Fe2O3 (integer-GCD reduction)."""
        comp = self.composition
        counts = list(comp.values())
        g = counts[0]
        for c in counts[1:]:
            g = math.gcd(g, c)
        parts = []
        for sym in sorted(comp):
            n = comp[sym] // g
            parts.append(sym + (str(n) if n > 1 else ""))
        return "".join(parts)

    def anonymized_formula(self) -> str:
        """ABC-style prototype label, e.g. AB2 (sorted by count then assigned letters)."""
        counts = sorted(self.composition.values())
        g = counts[0]
        for c in counts[1:]:
            g = math.gcd(g, c)
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        parts = []
        for i, c in enumerate(counts):
            n = c // g
            letter = letters[i % 26] * (1 + i // 26)
            parts.append(letter + (str(n) if n > 1 else ""))
        return "".join(parts)

    # -- serialization ------------------------------------------------------

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Structure":
        """Parse pymatgen `Structure.as_dict()` JSON (custom-inference input)."""
        lat_d = d["lattice"]
        if "matrix" in lat_d:
            lattice = Lattice(np.asarray(lat_d["matrix"], dtype=np.float64))
        else:
            lattice = Lattice.from_parameters(
                lat_d["a"], lat_d["b"], lat_d["c"],
                lat_d["alpha"], lat_d["beta"], lat_d["gamma"])
        species: List[str] = []
        fracs: List[Sequence[float]] = []
        for site in d["sites"]:
            sp = site.get("species")
            if sp:
                # majority-occupancy species on disordered sites
                best = max(sp, key=lambda e: float(e.get("occu", 1.0)))
                sym = best.get("element") or best.get("species") or ""
            else:
                sym = site.get("label", "")
            species.append(str(sym))
            fracs.append(site["abc"])
        return cls(lattice=lattice, species=species, frac_coords=np.asarray(fracs))

    def as_dict(self) -> Dict[str, Any]:
        lat = self.lattice
        return {
            "lattice": {
                "matrix": lat.matrix.tolist(),
                "a": lat.a, "b": lat.b, "c": lat.c,
                "alpha": lat.alpha, "beta": lat.beta, "gamma": lat.gamma,
                "volume": lat.volume,
            },
            "sites": [
                {"species": [{"element": s, "occu": 1}], "abc": list(map(float, fc))}
                for s, fc in zip(self.species, self.frac_coords)
            ],
        }
