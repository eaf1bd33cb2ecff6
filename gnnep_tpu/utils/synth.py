"""Synthetic graph-batch generation for benchmarks and compile checks.

Generates padded `GraphBatch` arenas with Materials-Project-like statistics
(CrystalNN-ish degree ~10, line-graph size ~degree² per bond) without paying
featurization cost — used by `bench.py` and `__graft_entry__.py`.
"""
from __future__ import annotations

import numpy as np

from ..data.batching import GraphBatch
from ..models.alignn import AlignnConfig


def synthetic_batch(rng: np.random.Generator, *, n_graphs: int = 64,
                    mean_atoms: int = 10, degree: int = 10,
                    node_dim: int = 206, edge_dim: int = 36,
                    angle_dim: int = 11, global_dim: int = 59,
                    target_dim: int = 2, slack: float = 1.1,
                    table_cap: int = 0, lg_table_cap: int = 0) -> GraphBatch:
    """One padded batch of random crystals with realistic arena shapes."""
    sizes = np.clip(rng.poisson(mean_atoms, n_graphs), 2, None)
    n_edges = sizes * degree
    n_lg = n_edges * (degree - 1)

    def cap(x, m=8):
        need = int(np.ceil(x * slack)) + 1
        return ((need + m - 1) // m) * m

    # node/edge arenas are fused-kernel aggregation rows → 128-row blocks
    Np, Ep, Lp = cap(sizes.sum(), 128), cap(n_edges.sum(), 128), cap(n_lg.sum(), 128)
    G = n_graphs
    dummy_node, dummy_edge = Np - 1, Ep - 1

    nodes = np.zeros((Np, node_dim), np.float32)
    node_graph = np.full(Np, G, np.int32)
    edge_src = np.full(Ep, dummy_node, np.int32)
    edge_dst = np.full(Ep, dummy_node, np.int32)
    edge_attr = np.zeros((Ep, edge_dim), np.float32)
    edge_mask = np.zeros(Ep, np.float32)
    lg_src = np.full(Lp, dummy_edge, np.int32)
    lg_dst = np.full(Lp, dummy_edge, np.int32)
    lg_attr = np.zeros((Lp, angle_dim), np.float32)
    lg_mask = np.zeros(Lp, np.float32)

    nc = ec = lc = 0
    for g in range(n_graphs):
        n, e, l = int(sizes[g]), int(n_edges[g]), int(n_lg[g])
        nodes[nc:nc + n] = rng.normal(size=(n, node_dim)).astype(np.float32)
        node_graph[nc:nc + n] = g
        edge_src[ec:ec + e] = rng.integers(0, n, e) + nc
        edge_dst[ec:ec + e] = rng.integers(0, n, e) + nc
        edge_attr[ec:ec + e] = rng.normal(size=(e, edge_dim)).astype(np.float32)
        edge_mask[ec:ec + e] = 1.0
        lg_src[lc:lc + l] = rng.integers(0, e, l) + ec
        lg_dst[lc:lc + l] = rng.integers(0, e, l) + ec
        lg_attr[lc:lc + l] = rng.normal(size=(l, angle_dim)).astype(np.float32)
        lg_mask[lc:lc + l] = 1.0
        nc += n
        ec += e
        lc += l

    y = np.exp(rng.normal(4.0, 0.9, size=(G, target_dim))).astype(np.float32)

    from ..data.batching import (apply_csr_sort, build_incoming_table,
                                 compute_span_lo, csr_row_ptrs,
                                 src_csr_index)

    (edge_src, edge_dst, edge_attr, edge_mask,
     lg_src, lg_dst, lg_attr, lg_mask) = apply_csr_sort(
        edge_src, edge_dst, edge_attr, edge_mask,
        lg_src, lg_dst, lg_attr, lg_mask)

    def rounded_cap(d, m, explicit):
        if explicit:
            return explicit
        real = d[m > 0]
        deg = int(np.bincount(real).max()) if real.size else 1
        return ((deg + 3) // 4) * 4

    node_tab, node_tab_mask, edge_pos = build_incoming_table(
        edge_dst, edge_mask, Np, rounded_cap(edge_dst, edge_mask, table_cap),
        dummy_edge)
    lg_tab, lg_tab_mask, lg_pos = build_incoming_table(
        lg_dst, lg_mask, Ep, rounded_cap(lg_dst, lg_mask, lg_table_cap), Lp - 1)
    node_ot, node_ot_mask, _ = build_incoming_table(
        edge_src, edge_mask, Np, rounded_cap(edge_src, edge_mask, table_cap),
        dummy_edge)
    lg_ot, lg_ot_mask, _ = build_incoming_table(
        lg_src, lg_mask, Ep, rounded_cap(lg_src, lg_mask, lg_table_cap), Lp - 1)
    e_order, e_starts = src_csr_index(edge_src, Np)
    l_order, l_starts = src_csr_index(lg_src, Ep)
    e_rp, l_rp = csr_row_ptrs(edge_dst, lg_dst, Np, Ep)
    n_span_lo, b_span_lo = compute_span_lo(node_graph, edge_dst, edge_mask, G)
    return GraphBatch(
        nodes=nodes, node_graph=node_graph,
        edge_src=edge_src, edge_dst=edge_dst, edge_attr=edge_attr,
        edge_mask=edge_mask, lg_src=lg_src, lg_dst=lg_dst, lg_attr=lg_attr,
        lg_mask=lg_mask,
        globals_=rng.normal(size=(G, global_dim)).astype(np.float32),
        sg_num=rng.integers(1, 231, G).astype(np.int32),
        y=y, graph_mask=np.ones(G, np.float32), weight=np.ones(G, np.float32),
        sample_index=np.arange(G, dtype=np.int32),
        node_in_edges=node_tab, node_in_mask=node_tab_mask,
        edge_table_pos=edge_pos,
        lg_in_edges=lg_tab, lg_in_mask=lg_tab_mask, lg_table_pos=lg_pos,
        node_out_edges=node_ot, node_out_mask=node_ot_mask,
        lg_out_edges=lg_ot, lg_out_mask=lg_ot_mask,
        edge_src_order=e_order, edge_src_starts=e_starts,
        lg_src_order=l_order, lg_src_starts=l_starts,
        edge_row_ptr=e_rp, lg_row_ptr=l_rp,
        y_mask=np.ones_like(y),
        node_span_lo=n_span_lo, bond_span_lo=b_span_lo)


def flagship_config(node_dim: int = 206, edge_dim: int = 36, angle_dim: int = 11,
                    global_scalar_dim: int = 59) -> AlignnConfig:
    """Reference-default flagship architecture (hidden 256, 4 layers, 4 heads)."""
    return AlignnConfig(node_dim=node_dim, edge_dim=edge_dim, angle_dim=angle_dim,
                        global_dim=global_scalar_dim + 230, target_dim=2,
                        hidden=256, layers=4, heads=4, dropout=0.15)
