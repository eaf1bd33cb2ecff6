"""Static-shape graph batching for XLA.

The reference relies on PyG dynamic batching (concatenate graphs, offset
indices — every batch a new shape). Under `jit` that would recompile per
batch, so this module packs graphs into fixed-capacity arenas with validity
masks — the keystone design decision for the TPU build (SURVEY.md §7 step 2).

Conventions:
- Node arena has capacity `Np`; index `Np-1` is the reserved DUMMY node.
  Padded edges point src=dst=dummy so their messages scatter into a slot
  that is never pooled. Padded nodes carry graph id `G` (one extra segment,
  dropped after pooling).
- Edge arena capacity `Ep`; index `Ep-1` is the reserved DUMMY bond, the
  target of padded line-graph edges.
- Graph arena capacity `G`; padded graph rows have `graph_mask=False`,
  y=1.0 (safe under log), weight 0.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

from .store import GraphStore


class GraphBatch(NamedTuple):
    """One padded batch; a pytree of arrays with static shapes.

    Besides the COO arenas, batches carry *dense incoming-edge tables* — the
    TPU-native aggregation layout: `node_in_edges[n, d]` lists the edge slots
    targeting node n (padded with the dummy edge), so attention softmax and
    message aggregation become plain masked reductions over the degree axis
    with no XLA scatter anywhere. `edge_table_pos` is the inverse map (each
    edge's flat position in that table) that turns the backward pass into a
    pure gather. Same structure one level up for the line graph.
    """

    nodes: np.ndarray        # [Np, F_node] f32
    node_graph: np.ndarray   # [Np] i32 — graph slot, padding → G
    edge_src: np.ndarray     # [Ep] i32 — node index (message source)
    edge_dst: np.ndarray     # [Ep] i32 — node index (aggregation target)
    edge_attr: np.ndarray    # [Ep, F_edge] f32
    edge_mask: np.ndarray    # [Ep] f32 (1 = real)
    lg_src: np.ndarray       # [Lp] i32 — bond index
    lg_dst: np.ndarray       # [Lp] i32
    lg_attr: np.ndarray      # [Lp, F_angle] f32
    lg_mask: np.ndarray      # [Lp] f32
    globals_: np.ndarray     # [G, 59] f32
    sg_num: np.ndarray       # [G] i32 (1..230, 0 unknown/padding)
    y: np.ndarray            # [G, T] f32
    graph_mask: np.ndarray   # [G] f32
    weight: np.ndarray       # [G] f32 per-sample loss weights
    sample_index: np.ndarray  # [G] i32 global dataset index (−1 padding)
    node_in_edges: np.ndarray  # [Np, Da] i32 edge slots with dst == n (pad: Ep-1)
    node_in_mask: np.ndarray   # [Np, Da] f32
    edge_table_pos: np.ndarray  # [Ep] i32 flat position in node_in_edges
    lg_in_edges: np.ndarray    # [Ep, Dl] i32 LG slots with dst == bond (pad: Lp-1)
    lg_in_mask: np.ndarray     # [Ep, Dl] f32
    lg_table_pos: np.ndarray   # [Lp] i32 flat position in lg_in_edges
    node_out_edges: np.ndarray  # [Np, Doa] i32 edge slots with src == n
    node_out_mask: np.ndarray   # [Np, Doa] f32
    lg_out_edges: np.ndarray    # [Ep, Dol] i32 LG slots with src == bond
    lg_out_mask: np.ndarray     # [Ep, Dol] f32
    edge_src_order: np.ndarray  # [Ep] i32 permutation sorting edges by src
    edge_src_starts: np.ndarray  # [Np] i32 per-node start in that order
    lg_src_order: np.ndarray    # [Lp] i32 permutation sorting LG by src
    lg_src_starts: np.ndarray   # [Ep] i32 per-bond start in that order

    @property
    def capacity(self):
        return (self.nodes.shape[0], self.edge_src.shape[0],
                self.lg_src.shape[0], self.y.shape[0])

    @property
    def n_real_graphs(self) -> int:
        return int(np.asarray(self.graph_mask).sum())


@dataclasses.dataclass(frozen=True)
class BatchBudget:
    """Fixed arena capacities; one compilation per budget."""

    n_graphs: int
    n_nodes: int    # includes the dummy slot
    n_edges: int    # includes the dummy slot
    n_lg_edges: int
    max_in_degree: int = 32      # dense-table width: atom in-degree cap
    max_lg_in_degree: int = 32   # dense-table width: bond LG in-degree cap
    max_out_degree: int = 32     # atom out-degree cap (gather-VJP tables)
    max_lg_out_degree: int = 32  # bond LG out-degree cap

    @classmethod
    def plan(cls, store: GraphStore, indices: Sequence[int], batch_size: int,
             slack: float = 1.15, quantile: float = 0.95) -> "BatchBudget":
        """Size arenas so `batch_size` typical graphs fit: capacity =
        max(largest single graph, batch_size × q-quantile × slack), rounded
        up to a multiple of 8 (TPU sublane) with +1 dummy slot. Dense-table
        widths are the dataset maxima of atom in-degree / bond LG in-degree."""
        idx = np.asarray(list(indices), dtype=np.int64)
        if idx.size == 0:
            raise ValueError("Cannot plan a batch budget over an empty index set.")
        n = np.diff(store.node_off)[idx]
        e = np.diff(store.edge_off)[idx]
        l = np.diff(store.lg_off)[idx]

        def cap(counts: np.ndarray, mult: int = 8) -> int:
            # mean-based capacity: on heavy-tailed distributions a
            # quantile-based budget overshoots the typical batch several-fold
            # (mostly padding); the packer emits a batch early when a tail
            # graph would overflow, and max() guarantees every graph fits
            per = float(counts.mean()) if counts.size else 1.0
            need = max(int(counts.max(initial=1)),
                       int(np.ceil(batch_size * per * slack)))
            return _round_up(need + 1, mult)

        deg_a = deg_l = deg_ao = deg_lo = 1
        for g in idx:
            n_g = int(store.node_off[g + 1] - store.node_off[g])
            e_g = store.edge_dst[store.edge_off[g]:store.edge_off[g + 1]]
            es_g = store.edge_src[store.edge_off[g]:store.edge_off[g + 1]]
            l_g = store.lg_dst[store.lg_off[g]:store.lg_off[g + 1]]
            ls_g = store.lg_src[store.lg_off[g]:store.lg_off[g + 1]]
            if e_g.size:
                deg_a = max(deg_a, int(np.bincount(e_g, minlength=n_g).max()))
                deg_ao = max(deg_ao, int(np.bincount(es_g, minlength=n_g).max()))
            if l_g.size:
                deg_l = max(deg_l, int(np.bincount(l_g).max()))
                deg_lo = max(deg_lo, int(np.bincount(ls_g).max()))
        # all arenas pad to the fused kernel's 128 tile (node/edge rows are
        # aggregation blocks; the LG arena is a 128-lane-aligned window source)
        return cls(n_graphs=int(batch_size), n_nodes=cap(n, 128),
                   n_edges=cap(e, 128), n_lg_edges=cap(l, 128),
                   max_in_degree=_round_up(deg_a, 4),
                   max_lg_in_degree=_round_up(deg_l, 4),
                   max_out_degree=_round_up(deg_ao, 4),
                   max_lg_out_degree=_round_up(deg_lo, 4))


def build_incoming_table(dst: np.ndarray, mask: np.ndarray, n_rows: int,
                         cap: int, pad_slot: int):
    """Dense incoming table for one arena.

    Returns (table [n_rows, cap] i32, table_mask [n_rows, cap] f32,
    pos [len(dst)] i32) where `pos[e]` is edge e's flat slot in the table
    (padded entries point at row n_rows-1's last column, which is always a
    masked slot by the dummy-row convention).
    """
    e_total = dst.shape[0]
    table = np.full((n_rows, cap), pad_slot, dtype=np.int32)
    table_mask = np.zeros((n_rows, cap), dtype=np.float32)
    safe_pos = (n_rows - 1) * cap + (cap - 1)
    pos = np.full(e_total, safe_pos, dtype=np.int32)
    real = np.nonzero(mask > 0)[0]
    if real.size:
        d = dst[real]
        order = np.argsort(d, kind="stable")
        ds, es = d[order], real[order]
        first = np.searchsorted(ds, ds)
        cum = np.arange(ds.size) - first
        overflow = int(cum.max(initial=0))
        if overflow >= cap:
            raise ValueError(
                f"in-degree {overflow + 1} exceeds dense-table capacity {cap}; "
                "re-plan the batch budget over these indices.")
        table[ds, cum] = es
        table_mask[ds, cum] = 1.0
        pos[es] = ds.astype(np.int64) * cap + cum
    return table, table_mask, pos


def src_csr_index(src_vals: np.ndarray, n_rows: int):
    """Permutation sorting an arena by source plus per-row segment starts —
    the gather-transpose layout consumed by the windowed segment-sum kernel."""
    order = np.argsort(src_vals, kind="stable").astype(np.int32)
    starts = np.searchsorted(src_vals[order], np.arange(n_rows)).astype(np.int32)
    return order, starts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _csr_sort(dst: np.ndarray, cap: int) -> np.ndarray:
    """Stable permutation sorting an arena by aggregation target. Padded
    entries (dst = dummy, the maximum index) sort last, and stability keeps
    the reserved dummy row at index cap-1."""
    return np.argsort(dst, kind="stable").astype(np.int64)


def apply_csr_sort(edge_src, edge_dst, edge_attr, edge_mask,
                   lg_src, lg_dst, lg_attr, lg_mask):
    """CSR-sort both arenas by aggregation target, remapping the line
    graph's bond references through the edge permutation."""
    Ep, Lp = edge_src.shape[0], lg_src.shape[0]
    edge_perm = _csr_sort(edge_dst, Ep)
    inv_edge = np.empty(Ep, np.int32)
    inv_edge[edge_perm] = np.arange(Ep, dtype=np.int32)
    edge_src = edge_src[edge_perm]
    edge_dst = edge_dst[edge_perm]
    edge_attr = edge_attr[edge_perm]
    edge_mask = edge_mask[edge_perm]
    lg_src = inv_edge[lg_src]
    lg_dst = inv_edge[lg_dst]
    lg_perm = _csr_sort(lg_dst, Lp)
    return (edge_src, edge_dst, edge_attr, edge_mask,
            lg_src[lg_perm], lg_dst[lg_perm], lg_attr[lg_perm],
            lg_mask[lg_perm])


class BatchPacker:
    """Greedy first-fit packer: graphs are packed in the given order until a
    capacity would overflow, then the batch is emitted."""

    def __init__(self, store: GraphStore, budget: BatchBudget):
        self.store = store
        self.budget = budget

    def pack(self, indices: Sequence[int],
             weights: Optional[np.ndarray] = None,
             drop_remainder: bool = False) -> Iterator[GraphBatch]:
        b = self.budget
        cur: List[int] = []
        n_used, e_used, l_used = 0, 0, 0
        for i in indices:
            n, e, l = self.store.counts(int(i))
            if n > b.n_nodes - 1 or e > b.n_edges - 1 or l > b.n_lg_edges:
                raise ValueError(
                    f"Graph {i} (nodes={n}, edges={e}, lg={l}) exceeds batch budget {b}; "
                    "re-plan with a larger quantile/slack.")
            if (len(cur) + 1 > b.n_graphs or n_used + n > b.n_nodes - 1
                    or e_used + e > b.n_edges - 1 or l_used + l > b.n_lg_edges):
                yield self._assemble(cur, weights)
                cur, n_used, e_used, l_used = [], 0, 0, 0
            cur.append(int(i))
            n_used += n
            e_used += e
            l_used += l
        if cur and not drop_remainder:
            yield self._assemble(cur, weights)

    def _assemble(self, graph_ids: List[int], weights: Optional[np.ndarray]) -> GraphBatch:
        s, b = self.store, self.budget
        Np, Ep, Lp, G = b.n_nodes, b.n_edges, b.n_lg_edges, b.n_graphs
        dummy_node, dummy_edge = Np - 1, Ep - 1
        f_node, f_edge, f_angle = s.node_dim, s.edge_dim, s.angle_dim

        nodes = np.zeros((Np, f_node), dtype=np.float32)
        node_graph = np.full(Np, G, dtype=np.int32)
        edge_src = np.full(Ep, dummy_node, dtype=np.int32)
        edge_dst = np.full(Ep, dummy_node, dtype=np.int32)
        edge_attr = np.zeros((Ep, f_edge), dtype=np.float32)
        edge_mask = np.zeros(Ep, dtype=np.float32)
        lg_src = np.full(Lp, dummy_edge, dtype=np.int32)
        lg_dst = np.full(Lp, dummy_edge, dtype=np.int32)
        lg_attr = np.zeros((Lp, f_angle), dtype=np.float32)
        lg_mask = np.zeros(Lp, dtype=np.float32)
        globals_ = np.zeros((G, s.global_scalar_dim), dtype=np.float32)
        sg_num = np.zeros(G, dtype=np.int32)
        y = np.ones((G, s.target_dim), dtype=np.float32)
        graph_mask = np.zeros(G, dtype=np.float32)
        weight = np.zeros(G, dtype=np.float32)
        sample_index = np.full(G, -1, dtype=np.int32)

        n_cursor = e_cursor = l_cursor = 0
        for slot, g in enumerate(graph_ids):
            n0, n1 = s.node_off[g], s.node_off[g + 1]
            e0, e1 = s.edge_off[g], s.edge_off[g + 1]
            l0, l1 = s.lg_off[g], s.lg_off[g + 1]
            n, e, l = n1 - n0, e1 - e0, l1 - l0

            nodes[n_cursor:n_cursor + n] = s.node_feats[n0:n1]
            node_graph[n_cursor:n_cursor + n] = slot
            edge_src[e_cursor:e_cursor + e] = s.edge_src[e0:e1] + n_cursor
            edge_dst[e_cursor:e_cursor + e] = s.edge_dst[e0:e1] + n_cursor
            edge_attr[e_cursor:e_cursor + e] = s.edge_attr[e0:e1]
            edge_mask[e_cursor:e_cursor + e] = 1.0
            lg_src[l_cursor:l_cursor + l] = s.lg_src[l0:l1] + e_cursor
            lg_dst[l_cursor:l_cursor + l] = s.lg_dst[l0:l1] + e_cursor
            lg_attr[l_cursor:l_cursor + l] = s.lg_attr[l0:l1]
            lg_mask[l_cursor:l_cursor + l] = 1.0
            globals_[slot] = s.global_scalars[g]
            sg_num[slot] = s.sg_num[g]
            yg = s.y[g]
            if np.isfinite(yg).all():
                y[slot] = yg
            graph_mask[slot] = 1.0
            weight[slot] = 1.0 if weights is None else float(weights[g])
            sample_index[slot] = g
            n_cursor += n
            e_cursor += e
            l_cursor += l

        # CSR-sort both arenas by aggregation target: segments become
        # contiguous (dense-table gathers coalesce; Pallas kernels window
        # them with a single DMA). Padded slots (dst = dummy) sort last,
        # except the reserved dummy row itself which must stay at Ep-1/Lp-1.
        (edge_src, edge_dst, edge_attr, edge_mask,
         lg_src, lg_dst, lg_attr, lg_mask) = apply_csr_sort(
            edge_src, edge_dst, edge_attr, edge_mask,
            lg_src, lg_dst, lg_attr, lg_mask)

        node_tab, node_tab_mask, edge_pos = build_incoming_table(
            edge_dst, edge_mask, Np, b.max_in_degree, dummy_edge)
        lg_tab, lg_tab_mask, lg_pos = build_incoming_table(
            lg_dst, lg_mask, Ep, b.max_lg_in_degree, Lp - 1)
        node_ot, node_ot_mask, _ = build_incoming_table(
            edge_src, edge_mask, Np, b.max_out_degree, dummy_edge)
        lg_ot, lg_ot_mask, _ = build_incoming_table(
            lg_src, lg_mask, Ep, b.max_lg_out_degree, Lp - 1)
        e_order, e_starts = src_csr_index(edge_src, Np)
        l_order, l_starts = src_csr_index(lg_src, Ep)
        return GraphBatch(nodes, node_graph, edge_src, edge_dst, edge_attr,
                          edge_mask, lg_src, lg_dst, lg_attr, lg_mask,
                          globals_, sg_num, y, graph_mask, weight, sample_index,
                          node_tab, node_tab_mask, edge_pos,
                          lg_tab, lg_tab_mask, lg_pos,
                          node_ot, node_ot_mask, lg_ot, lg_ot_mask,
                          e_order, e_starts, l_order, l_starts)


def epoch_batches(store: GraphStore, indices: Sequence[int], budget: BatchBudget,
                  *, shuffle: bool, rng: Optional[np.random.Generator] = None,
                  weights: Optional[np.ndarray] = None) -> List[GraphBatch]:
    """Materialize one epoch's batches (optionally shuffled)."""
    order = np.asarray(list(indices), dtype=np.int64)
    if shuffle:
        if rng is None:
            rng = np.random.default_rng()
        order = order[rng.permutation(order.size)]
    return list(BatchPacker(store, budget).pack(order, weights=weights))
