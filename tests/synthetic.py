"""Synthetic dataset fixture shared by tests.

Mirrors the reference smoke fixture (`/root/reference/tests/smoke.py:30-72`):
small cubic Si cells featurized through the *real* pipeline with a tiny basis,
distinct prototypes so grouped splits see many groups.
"""
import numpy as np

from gnnep_tpu.data.featurize import BasisConfig, build_graph
from gnnep_tpu.data.store import GraphStore
from gnnep_tpu.data.structure import Lattice, Structure

BASIS = BasisConfig(rbf_n=4, rbf_cutoff=4.0, angle_n=4)


def make_samples(n=8, seed=0, with_mat2vec_dim=0, basis=BASIS):
    rng = np.random.default_rng(seed)
    m2v = None
    if with_mat2vec_dim:
        m2v = {"Si": rng.normal(size=with_mat2vec_dim),
               "Ge": rng.normal(size=with_mat2vec_dim)}
    samples = []
    for i in range(n):
        a = 3.0 + 0.12 * (i % 5) + rng.uniform(0, 0.02)
        species = ["Si", "Si"] if i % 3 else ["Si", "Ge"]
        s = Structure(Lattice(np.eye(3) * a), species,
                      [[0, 0, 0], [0.5, 0.5, 0.5]])
        k = float(80.0 + 30 * rng.random())
        g = float(40.0 + 20 * rng.random())
        samples.append(build_graph(
            s, material_id=f"mp-{i:04d}", y=[k, g], basis=basis,
            nn_method="cutoff", cutoff=a * 0.9, mat2vec=m2v,
            prototype=f"proto_{i}", sg_num=(i % 230) + 1))
    return samples


def make_store(n=8, seed=0, with_mat2vec_dim=0, basis=BASIS) -> GraphStore:
    return GraphStore.from_samples(make_samples(n, seed, with_mat2vec_dim, basis))
