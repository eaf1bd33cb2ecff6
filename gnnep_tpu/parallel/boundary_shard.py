"""Boundary-exchange edge partitioning — communication ∝ partition boundary.

The formulation BASELINE.json's north star and SURVEY.md §7 step 7 prescribe
(and VERDICT r3 item 1 names as the last designed-but-unbuilt subsystem):
aggregation targets (atoms, and bonds as line-graph nodes) are partitioned
into CONTIGUOUS per-rank row ranges at pack time — the packer's CSR sort by
aggregation target makes every rank's edge slice row-contiguous — and the
only per-conv communication is an `all_to_all` of the BOUNDARY source rows
each rank needs from their owners.

Contrast with `edge_shard.py` (the all-reduce formulation): there node/bond
states stay replicated and every conv pays a [N, H]-shaped psum + [N, heads]
pmax regardless of locality, with k/v/skip projections replicated across
ranks. Here:

- q/k/v/skip projections run ONLY on the owning rank's rows (compute shards
  as N/S with no replication),
- softmax is entirely rank-local (a target row's full incoming segment lives
  on its owner by construction — no cross-rank max/denominator collectives),
- the exchanged tensors are `[S·B, 2H]` packed (key‖value) rows, where B is
  the pack-time-measured boundary budget: the number of distinct cross-rank
  source rows, deduplicated per rank pair. Communication volume is
  proportional to the partition boundary, not O(N·H)
  (`BoundaryPlan.comm_bytes_per_conv` vs `allreduce_bytes_per_conv`).
- the `all_to_all` is issued before any local projection/logit work and its
  result is consumed only at the single source-gather, so the latency-hiding
  scheduler can overlap the ICI transfer with the local aggregation.

Line-graph consistency (SURVEY §7 "hard parts"): a bond is OWNED by the rank
that owns its dst atom (the atom-conv edge slices), and the line graph is
partitioned by dst bond — so LG aggregation targets are exactly the owner's
bond rows, the atom conv's per-edge features (edge_proj of the updated bond
states) are rank-local by construction, and each layer needs exactly one
bond-row exchange (LG conv sources) plus one atom-row exchange (atom conv
sources).

Reference analogue: none — the reference is single-GPU
(/root/reference/scripts/train.py); this partitions the model the reference
runs whole, for graphs larger than one chip.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.featurize import N_SG
from ..models.alignn import Params, _dropout, _layer_norm, _mlp
from ..ops.graph_attention import TransformerConvParams, beta_blend
from ..ops.segment import gather_rows, segment_softmax, segment_sum


class BoundaryBatch(NamedTuple):
    """Pack-time boundary-partitioned batch; a pytree of arrays.

    Per-rank arrays are stacked on a leading shard axis [S, ...]; graph-level
    arrays are replicated across the edge axis. All shapes static.
    """

    nodes: np.ndarray        # [S, Rn, F_node] own atom rows
    node_graph: np.ndarray   # [S, Rn] graph slot (padding → G)
    a_dst: np.ndarray        # [S, E_loc] LOCAL dst atom row of own edges
    a_src_slot: np.ndarray   # [S, E_loc] index into [Rn + S·Bn] kv arena
    a_mask: np.ndarray       # [S, E_loc]
    edge_attr: np.ndarray    # [S, E_loc, F_edge] raw features of own bonds
    l_dst: np.ndarray        # [S, L_loc] LOCAL dst bond row of own LG edges
    l_src_slot: np.ndarray   # [S, L_loc] index into [E_loc + S·Bl] kv arena
    l_mask: np.ndarray       # [S, L_loc]
    lg_attr: np.ndarray      # [S, L_loc, F_angle]
    n_send: np.ndarray       # [S, S·Bn] own atom rows to send (slot t·Bn+b → rank t)
    e_send: np.ndarray       # [S, S·Bl] own bond rows to send
    # replicated graph-level fields
    globals_: np.ndarray     # [G, 59]
    sg_num: np.ndarray       # [G]
    y: np.ndarray            # [G, T]
    y_mask: np.ndarray       # [G, T]
    graph_mask: np.ndarray   # [G]
    weight: np.ndarray       # [G]


@dataclasses.dataclass(frozen=True)
class BoundaryPlan:
    """Static partition geometry (NOT part of the pytree)."""

    n_shards: int
    rn: int          # atom rows per rank (equal windows: Np / S)
    e_loc: int       # padded bond-window size (max real count over ranks)
    l_loc: int       # padded LG-window size
    bn: int          # atom boundary budget: max rows any rank pair exchanges
    bl: int          # bond boundary budget
    n_graphs: int
    # actual (pre-padding) boundary row counts, for diagnostics/tests
    atom_boundary_rows: int
    bond_boundary_rows: int

    @property
    def a_arena(self) -> int:
        """Atom-conv local arena: own rows ‖ recv rows ‖ pad ‖ dummy last.
        128-aligned so the Pallas kernels' row blocking applies (they
        require n % block == 0; see ops/pallas pick_block_n)."""
        return _round_up(self.rn + self.n_shards * self.bn + 1, 128)

    @property
    def l_arena(self) -> int:
        return _round_up(self.e_loc + self.n_shards * self.bl + 1, 128)

    def comm_bytes_per_conv(self, hidden: int, dtype_bytes: int = 4,
                            projected: bool = True) -> Dict[str, int]:
        """Per-rank bytes SENT per convolution — ∝ boundary budget.

        `projected=True` is the COO path (owner-projected key‖value rows,
        2H each); the fused-kernel path exchanges RAW states (H each,
        projections recomputed by the consumer — half the wire bytes for a
        boundary-sized slice of duplicated GEMM work)."""
        width = 2 * hidden if projected else hidden
        return {
            "atom_conv": self.n_shards * self.bn * width * dtype_bytes,
            "lg_conv": self.n_shards * self.bl * width * dtype_bytes,
        }

    def allreduce_bytes_per_conv(self, n_nodes: int, n_bonds: int,
                                 hidden: int, heads: int,
                                 dtype_bytes: int = 4) -> Dict[str, int]:
        """The all-reduce formulation's per-rank per-conv volume for the same
        batch: one [rows, H+128] psum + one [rows, heads] pmax
        (edge_shard._windowed_conv) — O(N·H), independent of locality."""
        return {
            "atom_conv": n_nodes * (hidden + 128 + heads) * dtype_bytes,
            "lg_conv": n_bonds * (hidden + 128 + heads) * dtype_bytes,
        }


def _round_up(x: int, to: int) -> int:
    return ((max(int(x), 0) + to - 1) // to) * to


def plan_boundary_batches(batches, n_shards: int):
    """Plan several same-budget batches with SHARED static geometry (the
    padded window and boundary budgets are elementwise maxima over the
    batches), so the resulting BoundaryBatches stack for data parallelism
    under one compiled program. Returns ([BoundaryBatch], BoundaryPlan)."""
    geoms = [plan_boundary(b, n_shards)[1] for b in batches]
    shared = dict(
        min_e_loc=max(g.e_loc for g in geoms),
        min_l_loc=max(g.l_loc for g in geoms),
        min_bn=max(g.bn for g in geoms),
        min_bl=max(g.bl for g in geoms))
    out = [plan_boundary(b, n_shards, **shared) for b in batches]
    # geometry fields are identical across re-plans; the boundary-row
    # DIAGNOSTICS are per-batch actuals, so report the maxima rather than
    # silently returning batch 0's cut for all batches
    plan = dataclasses.replace(
        out[0][1],
        atom_boundary_rows=max(p.atom_boundary_rows for _, p in out),
        bond_boundary_rows=max(p.bond_boundary_rows for _, p in out))
    return [bb for bb, _ in out], plan


def plan_boundary(batch, n_shards: int, *, min_e_loc: int = 0,
                  min_l_loc: int = 0, min_bn: int = 0, min_bl: int = 0
                  ) -> Tuple[BoundaryBatch, BoundaryPlan]:
    """Partition a packed (CSR-sorted) GraphBatch for `n_shards` edge ranks.

    Atom rows split into equal contiguous windows of Rn = Np/S; each rank's
    bond slice is the CSR-contiguous dst range [row_ptr[s·Rn], row_ptr[(s+1)·
    Rn]) (so bond ownership = dst-atom ownership), and its LG slice is the
    CSR-contiguous range of LG edges targeting those bonds. Send lists hold
    the DEDUPLICATED cross-rank source rows per ordered rank pair, padded to
    the max pair budget (Bn / Bl). The `min_*` floors let several batches
    share one static geometry (`plan_boundary_batches`).
    """
    S = int(n_shards)
    nodes = np.asarray(batch.nodes)
    Np = nodes.shape[0]
    if Np % S != 0:
        raise ValueError(f"node arena ({Np}) not divisible by shards ({S})")
    rn = Np // S
    e_rp = np.asarray(batch.edge_row_ptr, np.int64)
    l_rp = np.asarray(batch.lg_row_ptr, np.int64)
    src = np.asarray(batch.edge_src, np.int64)
    dst = np.asarray(batch.edge_dst, np.int64)
    em = np.asarray(batch.edge_mask)
    lsrc = np.asarray(batch.lg_src, np.int64)
    ldst = np.asarray(batch.lg_dst, np.int64)
    lm = np.asarray(batch.lg_mask)
    eattr = np.asarray(batch.edge_attr)
    lattr = np.asarray(batch.lg_attr)

    e_start = e_rp[np.arange(S) * rn]
    e_end = e_rp[(np.arange(S) + 1) * rn]
    cnt_e = e_end - e_start
    # 128-multiples: the fused kernels require the edge arena % 128 == 0
    e_loc = max(_round_up(cnt_e.max(), 128), int(min_e_loc))
    l_start = l_rp[e_start]
    l_end = l_rp[e_end]
    cnt_l = l_end - l_start
    l_loc = max(_round_up(cnt_l.max(), 128), int(min_l_loc))

    def build_exchange(owner_of, local_of, sources_per_rank, min_b):
        """Generic send-plan builder.

        `sources_per_rank[s]`: global source row ids of rank s's REAL edges.
        Returns (send [S, S·B], slot_map: per (s) dict global-row → slot,
        B, total_boundary_rows)."""
        need: Dict[Tuple[int, int], List[int]] = {}
        for s in range(S):
            u = np.unique(sources_per_rank[s])
            owners = owner_of(u)
            for t in np.unique(owners):
                t = int(t)
                if t == s:
                    continue
                need[(t, s)] = sorted(int(x) for x in u[owners == t])
        b = max((len(v) for v in need.values()), default=0)
        total = sum(len(v) for v in need.values())
        b = max(_round_up(b, 8) if b else 0, int(min_b))
        send = np.zeros((S, S * b), np.int32)
        slot_of: List[Dict[int, int]] = [dict() for _ in range(S)]
        for (t, s), rows in need.items():
            for pos, g in enumerate(rows):
                send[t, s * b + pos] = local_of(np.int64(g))
                slot_of[s][g] = t * b + pos
        return send, slot_of, b, total

    # ---- atom conv exchange (sources are atoms; owner = u // rn) ----------
    a_sources = [src[e_start[s]:e_end[s]][em[e_start[s]:e_end[s]] > 0]
                 for s in range(S)]
    n_send, a_slot_of, bn, atom_btotal = build_exchange(
        lambda u: u // rn, lambda g: g % rn, a_sources, min_bn)

    # ---- LG conv exchange (sources are bonds; owner by bond range) --------
    def bond_owner(b_rows):
        return np.searchsorted(e_start, b_rows, side="right") - 1

    l_sources = [lsrc[l_start[s]:l_end[s]][lm[l_start[s]:l_end[s]] > 0]
                 for s in range(S)]
    e_send, l_slot_of, bl, bond_btotal = build_exchange(
        bond_owner, lambda g: g - e_start[int(bond_owner(np.asarray([g]))[0])],
        l_sources, min_bl)

    # ---- per-rank padded windows ------------------------------------------
    # Local arena convention mirrors the global one: arena = [own rows ‖
    # received boundary rows ‖ one reserved DUMMY row]. Tail padding edges
    # point src AND dst at the dummy (keeping the local dst sequence
    # CSR-sorted — required by the fused-kernel path's row pointers); masked
    # interior rows (dilution gaps) keep their real forward-filled dst but
    # source the dummy. The dummy state row is zero-filled by the conv.
    a_arena = _round_up(rn + S * bn + 1, 128)   # == plan.a_arena
    l_arena = _round_up(e_loc + S * bl + 1, 128)
    a_dst = np.full((S, e_loc), a_arena - 1, np.int32)
    a_src_slot = np.full((S, e_loc), a_arena - 1, np.int32)
    a_mask = np.zeros((S, e_loc), np.float32)
    edge_attr_w = np.zeros((S, e_loc, eattr.shape[1]), np.float32)
    l_dst = np.full((S, l_loc), l_arena - 1, np.int32)
    l_src_slot = np.full((S, l_loc), l_arena - 1, np.int32)
    l_mask = np.zeros((S, l_loc), np.float32)
    lg_attr_w = np.zeros((S, l_loc, lattr.shape[1]), np.float32)

    for s in range(S):
        ce, cl = int(cnt_e[s]), int(cnt_l[s])
        sl = slice(int(e_start[s]), int(e_end[s]))
        a_dst[s, :ce] = np.clip(dst[sl] - s * rn, 0, rn - 1)
        # the GLOBAL dummy row's tail-padding segment must land on the LOCAL
        # arena dummy: leaving it on the global dummy's local row would count
        # toward that row's 64-group span and balloon the kernels' win64
        # bound ~10× (measured: lg 640 → 6272 at flagship scale)
        glob_pad = (dst[sl] == Np - 1) & (em[sl] <= 0)
        a_dst[s, :ce][glob_pad] = a_arena - 1
        a_mask[s, :ce] = em[sl]
        edge_attr_w[s, :ce] = eattr[sl]
        u = src[sl]
        own = (u // rn) == s
        slots = np.full(ce, a_arena - 1, np.int64)
        msk = em[sl] > 0
        slots[own & msk] = u[own & msk] % rn
        for i in np.nonzero(~own & msk)[0]:
            slots[i] = rn + a_slot_of[s][int(u[i])]
        a_src_slot[s, :ce] = slots

        ll = slice(int(l_start[s]), int(l_end[s]))
        l_dst[s, :cl] = np.clip(ldst[ll] - e_start[s], 0, e_loc - 1)
        lglob_pad = (ldst[ll] == src.shape[0] - 1) & (lm[ll] <= 0)
        l_dst[s, :cl][lglob_pad] = l_arena - 1
        l_mask[s, :cl] = lm[ll]
        lg_attr_w[s, :cl] = lattr[ll]
        ub = lsrc[ll]
        owners = bond_owner(ub)
        lmsk = lm[ll] > 0
        lslots = np.full(cl, l_arena - 1, np.int64)
        # vectorized own-rank case; Python only touches the boundary edges
        # (giant graphs have millions of local LG rows — a full per-row
        # loop here would dominate pack time)
        lown = (owners == s) & lmsk
        lslots[lown] = ub[lown] - e_start[s]
        for i in np.nonzero(~lown & lmsk)[0]:
            lslots[i] = e_loc + l_slot_of[s][int(ub[i])]
        l_src_slot[s, :cl] = lslots

    bb = BoundaryBatch(
        nodes=nodes.reshape(S, rn, -1).astype(np.float32),
        node_graph=np.asarray(batch.node_graph, np.int32).reshape(S, rn),
        a_dst=a_dst, a_src_slot=a_src_slot, a_mask=a_mask,
        edge_attr=edge_attr_w,
        l_dst=l_dst, l_src_slot=l_src_slot, l_mask=l_mask, lg_attr=lg_attr_w,
        n_send=n_send, e_send=e_send,
        globals_=np.asarray(batch.globals_, np.float32),
        sg_num=np.asarray(batch.sg_num, np.int32),
        y=np.asarray(batch.y, np.float32),
        y_mask=np.asarray(batch.y_mask, np.float32),
        graph_mask=np.asarray(batch.graph_mask, np.float32),
        weight=np.asarray(batch.weight, np.float32))
    plan = BoundaryPlan(n_shards=S, rn=rn, e_loc=e_loc, l_loc=l_loc,
                        bn=bn, bl=bl, n_graphs=int(np.asarray(batch.y).shape[0]),
                        atom_boundary_rows=atom_btotal,
                        bond_boundary_rows=bond_btotal)
    return bb, plan


class BoundaryTables(NamedTuple):
    """Pack-time per-rank dense tables + CSR layouts for the fused-kernel
    boundary path — the same structures `GraphBatch` carries globally,
    built over each rank's LOCAL arena (own ‖ recv ‖ dummy rows), so
    `transformer_conv_table` (and its Pallas kernels) run per rank
    unmodified. All arrays stacked [S, ...]."""

    a_in: np.ndarray          # [S, A_n, Da]
    a_in_mask: np.ndarray
    a_pos: np.ndarray         # [S, E_loc]
    a_out: np.ndarray         # [S, A_n, Doa]
    a_out_mask: np.ndarray
    a_src_order: np.ndarray   # [S, E_loc]
    a_src_starts: np.ndarray  # [S, A_n]
    a_row_ptr: np.ndarray     # [S, A_n + 1]
    l_in: np.ndarray          # [S, A_l, Dl]
    l_in_mask: np.ndarray
    l_pos: np.ndarray         # [S, L_loc]
    l_out: np.ndarray         # [S, A_l, Dol]
    l_out_mask: np.ndarray
    l_src_order: np.ndarray   # [S, L_loc]
    l_src_starts: np.ndarray  # [S, A_l]
    l_row_ptr: np.ndarray     # [S, A_l + 1]


@dataclasses.dataclass(frozen=True)
class BoundaryKernelMeta:
    """Static per-plan kernel bounds measured over all rank windows."""

    a_win64: int
    a_src_win64: int
    l_win64: int
    l_src_win64: int


def build_boundary_tables(bbs, plan: BoundaryPlan
                          ) -> Tuple[List[BoundaryTables], BoundaryKernelMeta]:
    """Dense tables + CSR layouts + measured win64 bounds for every rank's
    local aggregation problem (the fused/table conv path).

    `bbs`: one BoundaryBatch or a list of same-plan batches — table caps and
    win64 bounds are shared maxima over all of them, so the returned tables
    stack for data parallelism under one compiled program. Returns
    ([BoundaryTables], BoundaryKernelMeta)."""
    from ..data.batching import (build_incoming_table, measure_seg_win64,
                                 measure_win64, src_csr_index)

    if isinstance(bbs, BoundaryBatch):
        bbs = [bbs]
    S = plan.n_shards

    def one_level(which, e_width, arena):
        dsts = [np.asarray(getattr(b, f"{which}_dst")) for b in bbs]
        slots = [np.asarray(getattr(b, f"{which}_src_slot")) for b in bbs]
        masks = [np.asarray(getattr(b, f"{which}_mask")) for b in bbs]
        caps_in = caps_out = 1
        for d, sl, m in zip(dsts, slots, masks):
            for s in range(S):
                real = m[s] > 0
                if real.any():
                    caps_in = max(caps_in, int(np.bincount(
                        d[s][real], minlength=arena).max()))
                    caps_out = max(caps_out, int(np.bincount(
                        sl[s][real], minlength=arena).max()))
        caps_in = _round_up(caps_in, 8)
        caps_out = _round_up(caps_out, 8)
        per_batch = []
        win = src_win = 1
        for d, sl, m in zip(dsts, slots, masks):
            tabs, tmasks, poss, outs, omasks, orders, starts, rps = \
                [], [], [], [], [], [], [], []
            for s in range(S):
                t, tm, p = build_incoming_table(d[s], m[s], arena, caps_in,
                                                e_width - 1)
                order, start = src_csr_index(sl[s], arena)
                ot, om, _ = build_incoming_table(sl[s], m[s], arena,
                                                 caps_out, e_width - 1,
                                                 order=order)
                rp = np.searchsorted(d[s], np.arange(arena + 1)
                                     ).astype(np.int32)
                tabs.append(t); tmasks.append(tm); poss.append(p)
                outs.append(ot); omasks.append(om)
                orders.append(order); starts.append(start); rps.append(rp)
                win = max(win, measure_win64(d[s], arena))
                src_win = max(src_win, measure_seg_win64(start, e_width))
            per_batch.append((np.stack(tabs), np.stack(tmasks),
                              np.stack(poss), np.stack(outs),
                              np.stack(omasks), np.stack(orders),
                              np.stack(starts), np.stack(rps)))
        return per_batch, _round_up(win, 32), _round_up(src_win, 32)

    a_parts, a_w, a_sw = one_level("a", plan.e_loc, plan.a_arena)
    l_parts, l_w, l_sw = one_level("l", plan.l_loc, plan.l_arena)
    tables = [BoundaryTables(*a, *l) for a, l in zip(a_parts, l_parts)]
    meta = BoundaryKernelMeta(a_win64=a_w, a_src_win64=a_sw,
                              l_win64=l_w, l_src_win64=l_sw)
    return tables, meta


def _exchange_kv(kv_own: jnp.ndarray, send_idx: jnp.ndarray, n_shards: int,
                 budget: int, axis_name: str) -> jnp.ndarray:
    """Gather this rank's outgoing boundary rows and all_to_all them.

    Returns the received [S·B, 2H] rows (slot t·B+b = row b sent by rank t).
    Issued FIRST in each conv so the transfer overlaps the local projections
    and logit work that follow — the result is consumed only at the single
    source gather."""
    send = kv_own[send_idx]                              # [S·B, 2H]
    send = send.reshape(n_shards, budget, kv_own.shape[1])
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv.reshape(n_shards * budget, kv_own.shape[1])


def boundary_conv(
    params: TransformerConvParams,
    x_own: jnp.ndarray,          # [R, H_in] own target rows
    src_slot: jnp.ndarray,       # [E_loc] into the [arena] kv layout
    dst_loc: jnp.ndarray,        # [E_loc] local target row (pad → arena-1)
    edge_feats: jnp.ndarray,     # [E_loc, F_e]
    send_idx: jnp.ndarray,       # [S·B] own rows to send
    *,
    heads: int,
    n_shards: int,
    budget: int,                 # B (static); 0 = no exchange at all
    arena: int,                  # R + S·B + 1 (own ‖ recv ‖ dummy)
    axis_name: str,
    edge_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """β-gated transformer conv with rank-local softmax and boundary-row
    exchange (owner-projected kv rows, 2H wire bytes per boundary row).
    Numerically ≡ `ops.graph_attention.transformer_conv` on the unsharded
    arrays (same per-row reduction structure — every target row's full
    incoming segment is local)."""
    r = x_own.shape[0]
    hidden = params.w_query.shape[1]
    ch = hidden // heads

    kv_own = jnp.concatenate([x_own @ params.w_key + params.b_key,
                              x_own @ params.w_value + params.b_value], -1)
    parts = [kv_own]
    filled = r
    if budget > 0:
        parts.append(_exchange_kv(kv_own, send_idx, n_shards, budget,
                                  axis_name))
        filled += n_shards * budget
    # zero-fill up to the 128-aligned arena; the last row is the dummy
    parts.append(jnp.zeros((arena - filled, 2 * hidden), kv_own.dtype))
    kv_all = jnp.concatenate(parts, axis=0)                 # [arena, 2H]

    e = edge_feats @ params.w_edge                          # [E_loc, H]
    kv_j = gather_rows(kv_all, src_slot)
    k_j = kv_j[:, :hidden] + e
    v_j = kv_j[:, hidden:] + e
    q = x_own @ params.w_query + params.b_query
    q_dst = gather_rows(q, jnp.minimum(dst_loc, r - 1))
    logits = jnp.sum((q_dst * k_j).reshape(-1, heads, ch), axis=-1) \
        / math.sqrt(ch)                                     # [E_loc, heads]
    alpha = segment_softmax(logits, dst_loc, arena, mask=edge_mask)
    if dropout_rng is not None and not (
            isinstance(dropout_rate, (int, float)) and dropout_rate <= 0.0):
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)
    msg = segment_sum((alpha[..., None] * v_j.reshape(-1, heads, ch)),
                      dst_loc, arena).reshape(arena, hidden)[:r]

    skip = x_own @ params.w_skip + params.b_skip
    return beta_blend(params.w_beta, skip, msg)


def boundary_conv_fused(
    params: TransformerConvParams,
    x_own: jnp.ndarray,          # [R, H_in] own target rows
    src_slot: jnp.ndarray,       # [E_loc]
    dst_loc: jnp.ndarray,        # [E_loc] (pad → arena-1; CSR-sorted)
    edge_feats: jnp.ndarray,     # [E_loc, F_e]
    send_idx: jnp.ndarray,       # [S·B] own rows to send
    tables: tuple,               # (in_edges, in_mask, pos, out_edges,
                                 #  out_mask, src_order, src_starts, row_ptr)
    *,
    cfg,
    heads: int,
    n_shards: int,
    budget: int,
    arena: int,
    axis_name: str,
    win64: int,
    src_win64: int,
    edge_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Fused-kernel boundary conv: exchange RAW states (H wire bytes per
    boundary row — half the kv exchange; the consumer recomputes the
    boundary rows' projections, a boundary-sized slice of duplicated GEMM),
    then run `transformer_conv_table` — the SAME dense-table / Pallas
    fused-kernel path the single-chip production step uses — over the
    rank-local arena. In-kernel softmax, [heads, E] logit layout, windowed
    VMEM DMA: the perf ladder of PERF.md applies per rank unmodified."""
    from ..ops.dense_attention import transformer_conv_table

    hidden = params.w_query.shape[1]
    parts = [x_own]
    filled = x_own.shape[0]
    if budget > 0:
        parts.append(_exchange_kv(x_own, send_idx, n_shards, budget,
                                  axis_name))
        filled += n_shards * budget
    # zero-fill up to the 128-aligned arena; the last row is the dummy
    parts.append(jnp.zeros((arena - filled, x_own.shape[1]), x_own.dtype))
    x_all = jnp.concatenate(parts, axis=0)                  # [arena, H]

    (in_edges, in_mask, pos, out_edges, out_mask,
     src_order, src_starts, row_ptr) = tables
    fused = cfg.conv_impl == "fused" and (
        jax.default_backend() == "tpu" or cfg.force_fused)
    out = transformer_conv_table(
        params, x_all, src_slot, dst_loc, edge_feats,
        in_edges, in_mask, pos, out_edges, out_mask, src_order, src_starts,
        heads=heads, edge_mask=edge_mask, dropout_rate=dropout_rate,
        dropout_rng=dropout_rng, fused=fused, win64=win64,
        src_win64=src_win64, row_ptr=row_ptr,
        attn_fused=cfg.attn_fused, attn_eproj=cfg.attn_eproj,
        force_fused=cfg.force_fused)
    return out[:x_own.shape[0]]


def boundary_trunk(params: Params, cfg, bb: BoundaryBatch, plan: BoundaryPlan,
                   *, axis_name: str, train: bool = False,
                   rng: Optional[jax.Array] = None,
                   tables: Optional[BoundaryTables] = None,
                   meta: Optional[BoundaryKernelMeta] = None) -> jnp.ndarray:
    """Boundary-partitioned `_shared_trunk`: per-rank arrays arrive with the
    leading shard axis stripped. Returns the REPLICATED [G, H] shared
    features (pooling partials are psum'd — the only non-boundary collective,
    [G+1, H+1]-sized).

    With `tables`+`meta` (from `build_boundary_tables`) and
    cfg.conv_impl in ('table', 'fused'), each conv runs the dense-table /
    fused-Pallas-kernel path over its rank-local arena — the single-chip
    production machinery per rank, with raw-state boundary exchange."""
    drop = cfg.dropout if train else 0.0
    S = plan.n_shards
    use_tables = (tables is not None and meta is not None
                  and getattr(cfg, "conv_impl", "coo") in ("table", "fused"))

    # replicated tail (feat_proj dropout) must use the SHARED key; per-rank
    # conv/residual dropout folds in the rank index
    rank = jax.lax.axis_index(axis_name)
    rng_local = None if rng is None else jax.random.fold_in(rng, rank)

    def next_local():
        nonlocal rng_local
        if rng_local is None:
            return None
        rng_local, sub = jax.random.split(rng_local)
        return sub

    node_state = _mlp(params["node_enc"], bb.nodes)        # [Rn, H]
    edge_state = _mlp(params["edge_enc"], bb.edge_attr)    # [E_loc, H]
    angle_emb = _mlp(params["angle_enc"], bb.lg_attr)      # [L_loc, H]

    has_lg = jax.lax.psum(jnp.sum(bb.l_mask), axis_name) > 0
    has_edges = jax.lax.psum(jnp.sum(bb.a_mask), axis_name) > 0

    def lg_conv(p, state, feats, key):
        if use_tables:
            return boundary_conv_fused(
                p, state, bb.l_src_slot, bb.l_dst, feats, bb.e_send,
                (tables.l_in, tables.l_in_mask, tables.l_pos, tables.l_out,
                 tables.l_out_mask, tables.l_src_order, tables.l_src_starts,
                 tables.l_row_ptr),
                cfg=cfg, heads=cfg.heads, n_shards=S, budget=plan.bl,
                arena=plan.l_arena, axis_name=axis_name, win64=meta.l_win64,
                src_win64=meta.l_src_win64, edge_mask=bb.l_mask,
                dropout_rate=drop, dropout_rng=key)
        return boundary_conv(
            p, state, bb.l_src_slot, bb.l_dst, feats, bb.e_send,
            heads=cfg.heads, n_shards=S, budget=plan.bl, arena=plan.l_arena,
            axis_name=axis_name, edge_mask=bb.l_mask,
            dropout_rate=drop, dropout_rng=key)

    def atom_conv(p, state, feats, key):
        if use_tables:
            return boundary_conv_fused(
                p, state, bb.a_src_slot, bb.a_dst, feats, bb.n_send,
                (tables.a_in, tables.a_in_mask, tables.a_pos, tables.a_out,
                 tables.a_out_mask, tables.a_src_order, tables.a_src_starts,
                 tables.a_row_ptr),
                cfg=cfg, heads=cfg.heads, n_shards=S, budget=plan.bn,
                arena=plan.a_arena, axis_name=axis_name, win64=meta.a_win64,
                src_win64=meta.a_src_win64, edge_mask=bb.a_mask,
                dropout_rate=drop, dropout_rng=key)
        return boundary_conv(
            p, state, bb.a_src_slot, bb.a_dst, feats, bb.n_send,
            heads=cfg.heads, n_shards=S, budget=plan.bn, arena=plan.a_arena,
            axis_name=axis_name, edge_mask=bb.a_mask,
            dropout_rate=drop, dropout_rng=key)

    for eb, nb in zip(params["edge_blocks"], params["node_blocks"]):
        out = lg_conv(eb["conv"], edge_state, angle_emb, next_local())
        out = _layer_norm(out, eb["ln_scale"], eb["ln_bias"])
        updated = edge_state + _dropout(jax.nn.relu(out), drop, next_local())
        edge_state = jnp.where(has_lg, updated, edge_state)

        edge_feat = edge_state @ nb["edge_proj_w"] + nb["edge_proj_b"]
        out = atom_conv(nb["conv"], node_state, edge_feat, next_local())
        out = _layer_norm(out, nb["ln_scale"], nb["ln_bias"])
        updated = node_state + _dropout(jax.nn.relu(out), drop, next_local())
        node_state = jnp.where(has_edges, updated, node_state)

    # segment-mean pooling with cross-rank partials (graphs may straddle
    # rank row windows): psum [G+1, H] sums and [G+1] counts — tiny
    g = plan.n_graphs
    sums = segment_sum(node_state, bb.node_graph, g + 1)
    ones = jnp.ones(node_state.shape[:1], node_state.dtype)
    counts = segment_sum(ones, bb.node_graph, g + 1)
    stacked = jnp.concatenate([sums, counts[:, None]], axis=-1)
    stacked = jax.lax.psum(stacked, axis_name)
    pooled = stacked[:g, :-1] / jnp.maximum(stacked[:g, -1:], 1.0)

    sg_one_hot = jax.nn.one_hot(bb.sg_num - 1, N_SG, dtype=pooled.dtype)
    feats = jnp.concatenate([pooled, bb.globals_, sg_one_hot], axis=-1)
    if rng is not None:
        rng, k1, k2 = jax.random.split(rng, 3)
    else:
        k1 = k2 = None
    feats = _dropout(feats, drop, k1)
    shared = jax.nn.relu(feats @ params["feat_proj"]["w"]
                         + params["feat_proj"]["b"])
    return _dropout(shared, drop, k2)


def boundary_apply(params: Params, cfg, bb: BoundaryBatch, plan: BoundaryPlan,
                   *, axis_name: str, train: bool = False,
                   rng: Optional[jax.Array] = None,
                   tables: Optional[BoundaryTables] = None,
                   meta: Optional[BoundaryKernelMeta] = None):
    shared = boundary_trunk(params, cfg, bb, plan, axis_name=axis_name,
                            train=train, rng=rng, tables=tables, meta=meta)
    mean = shared @ params["mean_head"]["w"] + params["mean_head"]["b"]
    logvar = shared @ params["logvar_head"]["w"] + params["logvar_head"]["b"]
    return mean, logvar
