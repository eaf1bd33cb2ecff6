"""Giant-graph routing: graphs exceeding the batch budget train and predict
through the boundary-exchange edge partition instead of raising in the
packer.

The reference never faces this case (unit cells, ~2-200 atoms —
`/root/reference/scripts/fetch.py`), but the TPU framework's north star
scales to graphs larger than one chip (SURVEY.md §2g "edge partitioning").
The pieces:

- `find_giants`: classify graphs that do not fit a batch budget (the same
  predicate the packer raises on, `data/batching.py` BatchPacker.pack).
- `classify_giants`: the fixpoint over `find_giants` shared by train's
  prepare(), evaluate, and predict (a huge giant inflates the
  typical-stats capacity and can hide smaller giants from one pass).
- `build_giant_set`: one covering single-graph budget over all giants, one
  shared `BoundaryPlan` (so every giant trains/predicts under ONE compiled
  boundary program), one BoundaryBatch per giant.
- `GiantSet.groups` / `inert_like`: stack giants `n_data` at a time for the
  mesh's data axis, padding short groups with inert (all-masked) copies.
- `collect_giant_predictions`: boundary-forward collection that mirrors
  `train.loop.collect_predictions`'s return contract.
- `make_giant_collector`: the validated (1 × n_shards) mesh + per-member
  collection shared by evaluate, predict, and calibration.

Enabled by `TrainConfig.giant_graphs = "boundary"`
(`cli/train --giant-graphs boundary --edge-shards S`); the default "error"
keeps the budget's cover-all guarantee and the packer's hard error.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.batching import BatchBudget, epoch_batches
from ..data.store import GraphStore
from .boundary_shard import BoundaryBatch, BoundaryPlan, plan_boundary_batches


def fits_budget(store: GraphStore, g: int, budget: BatchBudget) -> bool:
    """Same predicate the packer enforces (BatchPacker.pack)."""
    n, e, l = store.counts(int(g))
    return (n <= budget.n_nodes - 1 and e <= budget.n_edges - 1
            and l <= budget.n_lg_edges)


def find_giants(store: GraphStore, indices: Sequence[int],
                budget: BatchBudget) -> List[int]:
    """Graph ids in `indices` that the packer would reject for `budget`."""
    return [int(g) for g in indices if not fits_budget(store, g, budget)]


def classify_giants(store: GraphStore, indices: Sequence[int], plan_budget
                    ) -> Tuple[List[int], List[int], BatchBudget]:
    """Fixpoint giant classification shared by train/evaluate/predict.

    Giants inflate the mean-based capacity of a typical-statistics budget,
    hiding SMALLER giants behind a bigger one — so re-plan over the
    surviving population until the giant set stabilizes (strictly shrinking
    population ⇒ terminates). `plan_budget(population, cover_all)` builds a
    BatchBudget for a population (each caller binds its own batch-size /
    slack / quantile knobs). Returns `(normal, giants, budget)` with
    `normal` order-preserving, `giants` sorted, and `budget` the final plan
    over the normal population — cover-all (every non-giant fits) whenever
    any giant was split off; when none were, the initial typical-stats plan
    is returned unchanged (it demonstrably covers every graph).
    """
    normal = [int(g) for g in indices]
    giants: List[int] = []
    budget = plan_budget(normal, False)
    while normal:
        grown = set(find_giants(store, normal, budget))
        if not grown:
            break
        giants.extend(grown)
        normal = [g for g in normal if g not in grown]
        if normal:
            budget = plan_budget(normal, False)
    if giants and normal:
        budget = plan_budget(normal, True)
    return normal, sorted(giants), budget


@dataclasses.dataclass
class GiantSet:
    """All giant graphs' boundary-partitioned batches under ONE shared plan
    (one compiled program covers every giant)."""

    indices: List[int]                  # giant graph ids, sorted
    budget: BatchBudget                 # single-graph covering budget
    plan: BoundaryPlan
    n_shards: int
    bbs: Dict[int, BoundaryBatch]       # graph id → its BoundaryBatch

    def __contains__(self, g: int) -> bool:
        return int(g) in self.bbs

    def split(self, indices: Sequence[int]) -> Tuple[List[int], List[int]]:
        """(normal, giant) partition of `indices`, order-preserving."""
        normal, giant = [], []
        for g in indices:
            (giant if int(g) in self.bbs else normal).append(int(g))
        return normal, giant

    def inert_like(self, bb: BoundaryBatch) -> BoundaryBatch:
        """An all-masked copy: contributes zero loss, count, and gradient
        (graph_mask/y_mask/weight are the authorities everywhere)."""
        return bb._replace(
            graph_mask=np.zeros_like(np.asarray(bb.graph_mask)),
            y_mask=np.zeros_like(np.asarray(bb.y_mask)),
            weight=np.zeros_like(np.asarray(bb.weight)))

    def groups(self, ids: Sequence[int], n_data: int,
               weight_arr: Optional[np.ndarray] = None
               ) -> List[List[BoundaryBatch]]:
        """Group `ids` (each may repeat — bootstrap duplicates step again)
        into `n_data`-sized lists of BoundaryBatches, padding the final
        short group with inert copies. Optional per-graph loss weights are
        grafted the same way the packer grafts them onto GraphBatches."""
        bbs = []
        for g in ids:
            bb = self.bbs[int(g)]
            if weight_arr is not None:
                w = np.asarray(bb.graph_mask) * float(weight_arr[int(g)])
                bb = bb._replace(weight=w.astype(np.float32))
            bbs.append(bb)
        out: List[List[BoundaryBatch]] = []
        for at in range(0, len(bbs), n_data):
            group = bbs[at:at + n_data]
            while len(group) < n_data:
                group.append(self.inert_like(group[0]))
            out.append(group)
        return out


def build_giant_set(store: GraphStore, giant_idx: Sequence[int],
                    n_shards: int) -> GiantSet:
    """Pack every giant graph alone (shared covering budget → shared arena
    shapes) and boundary-partition them under one shared plan."""
    giant_idx = sorted(int(g) for g in giant_idx)
    if not giant_idx:
        raise ValueError("build_giant_set called with no giant graphs")
    budget = BatchBudget.plan(store, giant_idx, batch_size=1, slack=1.0,
                              cover_all=True)
    batches = []
    for g in giant_idx:
        bs = epoch_batches(store, [g], budget, shuffle=False)
        assert len(bs) == 1, "single-graph budget must pack one batch"
        batches.append(bs[0])
    bbs, plan = plan_boundary_batches(batches, n_shards)
    return GiantSet(indices=giant_idx, budget=budget, plan=plan,
                    n_shards=int(n_shards),
                    bbs={g: bb for g, bb in zip(giant_idx, bbs)})


def collect_giant_predictions(fwd, giant: GiantSet, ids: Sequence[int],
                              params, n_data: int):
    """Boundary-forward collection over giant graphs.

    `fwd` is a `make_boundary_forward(mesh, cfg, floor, plan)` program whose
    mesh data axis is `n_data` wide. Returns (mean_z [N,T], sigma_z [N,T],
    y_linear [N,T] with NaN where y_mask==0, sample_index [N]) over the real
    graphs of `ids`, in order — the same contract as
    `train.loop.collect_predictions`.
    """
    from .train_step import stack_boundary_for_mesh

    ids = [int(g) for g in ids]
    means, sigmas, ys, idxs = [], [], [], []
    for at in range(0, len(ids), n_data):
        chunk = ids[at:at + n_data]
        group = giant.groups(chunk, n_data)[0]
        mean, logvar = fwd(params, stack_boundary_for_mesh(group, n_data))
        mean = np.asarray(mean)
        sigma = np.sqrt(np.exp(np.asarray(logvar)))
        for d, g in enumerate(chunk):
            bb = group[d]
            mask = np.asarray(bb.graph_mask) > 0
            means.append(mean[d][mask])
            sigmas.append(sigma[d][mask])
            yv = np.where(np.asarray(bb.y_mask) > 0, np.asarray(bb.y),
                          np.nan)
            ys.append(yv[mask])
            idxs.append(np.full(int(mask.sum()), g, dtype=np.int32))
    if not means:
        t = int(np.asarray(next(iter(giant.bbs.values())).y).shape[-1])
        return (np.zeros((0, t)), np.zeros((0, t)), np.zeros((0, t)),
                np.zeros(0, np.int32))
    return (np.concatenate(means), np.concatenate(sigmas),
            np.concatenate(ys), np.concatenate(idxs))


def make_giant_collector(gset: GiantSet, floor: float,
                         compute_dtype: str = "float32"):
    """Validated boundary mesh + per-member giant collection, shared by
    evaluate/_collect_members, Ensemble.predict, and calibration's
    collect_ensemble (one implementation — the three call sites had begun
    to drift on device validation and compute_dtype).

    Builds the (1 × n_shards) mesh once — raising the same clear ValueError
    every sibling path raises when fewer devices are visible than edge
    shards — and returns `collect(params, cfg, ids)` mapping one member to
    `collect_giant_predictions`' (mean_z, sigma_z, y, sample_index) rows.
    """
    import jax

    from .mesh import make_mesh
    from .train_step import cached_boundary_forward

    n_dev = len(jax.devices())
    if gset.n_shards > n_dev:
        raise ValueError(f"giant boundary routing needs {gset.n_shards} "
                         f"edge-shard devices, have {n_dev} visible")
    bmesh = make_mesh(1, gset.n_shards, devices=jax.devices()[:gset.n_shards])

    def collect(params, cfg, ids: Sequence[int]):
        fwd = cached_boundary_forward(bmesh, cfg, floor, gset.plan,
                                      compute_dtype=compute_dtype)
        return collect_giant_predictions(fwd, gset, ids, params, 1)

    return collect
