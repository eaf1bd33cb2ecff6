"""Profile host batch packing on an MP-like synthetic GraphStore.

Generates graphs with realistic structure (dst-sorted bonds, LG in-degree ~
atom degree) straight into a columnar GraphStore, then profiles
BatchPacker.pack and epoch_batches at flagship batch size.
"""
import cProfile, io, pstats, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from gnnep_tpu.data.store import GraphStore
from gnnep_tpu.data.batching import BatchBudget, BatchPacker, epoch_batches


def mp_like_store(n_graphs=512, mean_atoms=10, degree=10, seed=0,
                  node_dim=206, edge_dim=36, angle_dim=11):
    rng = np.random.default_rng(seed)
    sizes = np.clip(rng.poisson(mean_atoms, n_graphs), 2, None)
    nf, es, ed, ea, ls, ld, la = [], [], [], [], [], [], []
    n_off = [0]; e_off = [0]; l_off = [0]
    for g in range(n_graphs):
        n = int(sizes[g])
        # bonds: each atom j receives `degree` incoming bonds (dst-sorted)
        dst = np.repeat(np.arange(n, dtype=np.int32), degree)
        src = rng.integers(0, n, dst.size).astype(np.int32)
        e = dst.size
        # LG: bond b = (src[b] -> dst[b]); its LG in-edges are bonds into src[b]
        # (in-degree `degree` each). lg_dst = b repeated, lg_src = bonds into src[b].
        lg_dst_g = np.repeat(np.arange(e, dtype=np.int32), degree)
        # bonds into atom a occupy slots a*degree .. (a+1)*degree-1
        lg_src_g = (src[lg_dst_g // degree] * degree
                    + rng.integers(0, degree, lg_dst_g.size)).astype(np.int32)
        l = lg_dst_g.size
        nf.append(rng.normal(size=(n, node_dim)).astype(np.float32))
        es.append(src); ed.append(dst)
        ea.append(rng.normal(size=(e, edge_dim)).astype(np.float32))
        ls.append(lg_src_g); ld.append(lg_dst_g)
        la.append(rng.normal(size=(l, angle_dim)).astype(np.float32))
        n_off.append(n_off[-1] + n); e_off.append(e_off[-1] + e)
        l_off.append(l_off[-1] + l)
    G = n_graphs
    return GraphStore(
        node_feats=np.concatenate(nf), edge_src=np.concatenate(es),
        edge_dst=np.concatenate(ed), edge_attr=np.concatenate(ea),
        lg_src=np.concatenate(ls), lg_dst=np.concatenate(ld),
        lg_attr=np.concatenate(la),
        node_off=np.asarray(n_off, np.int64), edge_off=np.asarray(e_off, np.int64),
        lg_off=np.asarray(l_off, np.int64),
        global_scalars=rng.normal(size=(G, 59)).astype(np.float32),
        sg_num=rng.integers(1, 231, G).astype(np.int32),
        y=np.exp(rng.normal(4.0, 0.9, size=(G, 2))).astype(np.float32),
        material_ids=[f"mp-{i}" for i in range(G)],
        formulas=["X"] * G, reduced_formulas=["X"] * G,
        prototypes=[f"p{i}" for i in range(G)])


def main():
    store = mp_like_store()
    idx = list(range(len(store)))
    budget = BatchBudget.plan(store, idx, 64)
    print("budget:", budget)
    batches = list(BatchPacker(store, budget).pack(idx))
    n_lg = sum(float(b.lg_mask.sum()) for b in batches)
    print(f"{len(batches)} batches, {n_lg:.0f} real lg edges")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        list(BatchPacker(store, budget).pack(idx))
    dt = (time.perf_counter() - t0) / reps
    print(f"serial: {dt*1e3:.1f} ms/epoch  {n_lg/dt/1e6:.2f} M lg-edges/s")
    for w in (2, 4, 8):
        t0 = time.perf_counter()
        for _ in range(reps):
            epoch_batches(store, idx, budget, shuffle=False, workers=w)
        dt = (time.perf_counter() - t0) / reps
        print(f"workers={w}: {dt*1e3:.1f} ms/epoch  {n_lg/dt/1e6:.2f} M lg-edges/s")
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        list(BatchPacker(store, budget).pack(idx))
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
