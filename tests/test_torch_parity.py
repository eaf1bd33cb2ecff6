"""Reference-semantics activation parity (VERDICT r2 item 4).

BASELINE.json's north star asks for per-layer activation `allclose` against
the reference model. PyTorch-Geometric is not installed here, so this module
carries a pure-torch transcription of the reference's documented semantics —
PyG `TransformerConv(H, H/heads, heads, edge_dim=H, beta=True)` (q from the
aggregation target, k/v from the source, edge features added to BOTH k and v,
per-destination segment softmax, β-gated skip) wrapped in the reference's
`EdgeUpdateBlock`/`NodeUpdateBlock`/`AlignnRegressor`/`HeteroAlignnRegressor`
structure (`/root/reference/scripts/train.py:303-401,528-586`). Both it and
`alignn_activations` are driven from ONE converted state dict
(`train.convert.convert_member_state`) on the same unpadded multi-graph
batch, and every intermediate activation is compared in float64.

Chain of custody: torch ≡ our COO path (this file, fp64) and
COO ≡ table ≡ fused Pallas (tests/test_dense_attention.py,
tests/test_pallas_kernel.py) — so the fused TPU kernels inherit
reference-model parity transitively.
"""
import math
import pathlib
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from synthetic import make_store  # noqa: E402
from test_convert import _torch_member_state  # noqa: E402

from gnnep_tpu.data.batching import GraphBatch  # noqa: E402
from gnnep_tpu.models.alignn import alignn_activations  # noqa: E402
from gnnep_tpu.train.convert import convert_member_state  # noqa: E402

N_SG = 230


# --------------------------------------------------------------------------
# Pure-torch transcription of the reference model family (semantics per
# train.py:303-401,528-586 and the PyG TransformerConv contract).
# --------------------------------------------------------------------------
class RefTransformerConv(nn.Module):
    """PyG TransformerConv(in, out_ch, heads, edge_dim, beta=True) semantics:

        q_i = lin_query(x_i);  k_j = lin_key(x_j) + e;  v_j = lin_value(x_j) + e
        α   = softmax over {edges e: dst(e)=i} of q_i·k_j / √C   (per head)
        m_i = Σ α (v_j)                     (targets with no edges get m=0)
        r_i = lin_skip(x_i);  β = σ(lin_beta([r ‖ m ‖ r−m]));  out = βr+(1−β)m
    """

    def __init__(self, in_dim: int, out_ch: int, heads: int, edge_dim: int):
        super().__init__()
        h = out_ch * heads
        self.heads, self.ch = heads, out_ch
        self.lin_query = nn.Linear(in_dim, h)
        self.lin_key = nn.Linear(in_dim, h)
        self.lin_value = nn.Linear(in_dim, h)
        self.lin_skip = nn.Linear(in_dim, h)
        self.lin_edge = nn.Linear(edge_dim, h, bias=False)
        self.lin_beta = nn.Linear(3 * h, 1, bias=False)

    def forward(self, x, edge_index, edge_attr):
        n = x.shape[0]
        H, C = self.heads, self.ch
        src, dst = edge_index[0], edge_index[1]
        e = self.lin_edge(edge_attr).view(-1, H, C)
        q = self.lin_query(x).view(n, H, C)[dst]
        k = self.lin_key(x).view(n, H, C)[src] + e
        v = self.lin_value(x).view(n, H, C)[src] + e
        logits = (q * k).sum(-1) / math.sqrt(C)                    # [E, H]
        # per-destination segment softmax (numerically stabilized)
        m = torch.full((n, H), -torch.inf, dtype=x.dtype)
        m = m.scatter_reduce(0, dst[:, None].expand(-1, H), logits,
                             reduce="amax", include_self=True)
        ex = torch.exp(logits - m[dst])
        denom = torch.zeros(n, H, dtype=x.dtype).index_add_(0, dst, ex)
        alpha = ex / denom[dst].clamp_min(1e-300)
        msg = torch.zeros(n, H, C, dtype=x.dtype).index_add_(
            0, dst, alpha.unsqueeze(-1) * v).view(n, H * C)
        r = self.lin_skip(x)
        beta = torch.sigmoid(self.lin_beta(torch.cat([r, msg, r - msg], -1)))
        return beta * r + (1.0 - beta) * msg


class RefEdgeUpdateBlock(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.conv = RefTransformerConv(hidden, hidden // heads, heads, hidden)
        self.norm = nn.LayerNorm(hidden)

    def forward(self, edge_state, lg_edge_index, angle_emb):
        if edge_state.numel() == 0 or lg_edge_index.numel() == 0:
            return edge_state
        out = self.norm(self.conv(edge_state, lg_edge_index, angle_emb))
        return edge_state + F.relu(out)     # eval: dropout is identity


class RefNodeUpdateBlock(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.edge_proj = nn.Linear(hidden, hidden)
        self.conv = RefTransformerConv(hidden, hidden // heads, heads, hidden)
        self.norm = nn.LayerNorm(hidden)

    def forward(self, node_state, edge_index, edge_state):
        if edge_state.numel() == 0 or edge_index.numel() == 0:
            return node_state
        out = self.norm(self.conv(node_state, edge_index,
                                  self.edge_proj(edge_state)))
        return node_state + F.relu(out)


class RefBase(nn.Module):
    def __init__(self, node_dim, edge_dim, angle_dim, global_dim, target_dim,
                 hidden, layers, heads):
        super().__init__()
        mk = lambda d: nn.Sequential(nn.Linear(d, hidden), nn.ReLU(),
                                     nn.Linear(hidden, hidden))
        self.node_encoder = mk(node_dim)
        self.edge_encoder = mk(edge_dim)
        self.angle_encoder = mk(angle_dim)
        self.edge_blocks = nn.ModuleList(
            [RefEdgeUpdateBlock(hidden, heads) for _ in range(layers)])
        self.node_blocks = nn.ModuleList(
            [RefNodeUpdateBlock(hidden, heads) for _ in range(layers)])
        self.feat_proj = nn.Sequential(nn.Linear(hidden + global_dim, hidden),
                                       nn.ReLU(), nn.Dropout(0.0))
        self.output_heads = nn.ModuleList(   # present in ckpts, unused
            [nn.Linear(hidden, 1) for _ in range(target_dim)])


class RefHetero(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.base = RefBase(**kw)
        t, h = kw["target_dim"], kw["hidden"]
        self.mean_heads = nn.ModuleList([nn.Linear(h, 1) for _ in range(t)])
        self.logvar_heads = nn.ModuleList([nn.Linear(h, 1) for _ in range(t)])

    def forward_with_activations(self, x, edge_index, edge_attr,
                                 lg_edge_index, lg_attr, batch_vec, global_x,
                                 sg_one_hot):
        acts = {}
        node_state = self.base.node_encoder(x)
        edge_state = self.base.edge_encoder(edge_attr)
        angle_emb = self.base.angle_encoder(lg_attr)
        acts["node_enc"], acts["edge_enc"] = node_state, edge_state
        acts["angle_enc"] = angle_emb
        for li, (eb, nb) in enumerate(zip(self.base.edge_blocks,
                                          self.base.node_blocks)):
            edge_state = eb(edge_state, lg_edge_index, angle_emb)
            node_state = nb(node_state, edge_index, edge_state)
            acts[f"layer{li}_edge"] = edge_state
            acts[f"layer{li}_node"] = node_state
        n_graphs = int(batch_vec.max()) + 1
        pooled = torch.zeros(n_graphs, node_state.shape[1],
                             dtype=x.dtype).index_add_(0, batch_vec, node_state)
        counts = torch.bincount(batch_vec, minlength=n_graphs).clamp_min(1)
        pooled = pooled / counts[:, None].to(x.dtype)
        acts["pooled"] = pooled
        feats = torch.cat([pooled, global_x, sg_one_hot], dim=1)
        shared = self.base.feat_proj(feats)
        acts["shared"] = shared
        acts["mean"] = torch.cat([h(shared) for h in self.mean_heads], dim=1)
        acts["logvar"] = torch.cat([h(shared) for h in self.logvar_heads],
                                   dim=1)
        return acts


# --------------------------------------------------------------------------
def _unpadded_batch(store, dtype=np.float64):
    """Exact-size (padding-free) GraphBatch over ALL graphs of a store,
    PyG-style concatenation with node/bond offsets — drives the COO conv
    path, where every row is real so activations align 1:1 with torch."""
    G = store.n_graphs
    srcs, dsts, lsrcs, ldsts, batch_vec = [], [], [], [], []
    for g in range(G):
        n0, e0 = store.node_off[g], store.edge_off[g]
        n1, e1 = store.node_off[g + 1], store.edge_off[g + 1]
        l0, l1 = store.lg_off[g], store.lg_off[g + 1]
        srcs.append(store.edge_src[e0:e1].astype(np.int64) + n0)
        dsts.append(store.edge_dst[e0:e1].astype(np.int64) + n0)
        lsrcs.append(store.lg_src[l0:l1].astype(np.int64) + e0)
        ldsts.append(store.lg_dst[l0:l1].astype(np.int64) + e0)
        batch_vec.append(np.full(n1 - n0, g, np.int64))
    z = lambda *s: np.zeros(s, np.int32)
    zf = lambda *s: np.zeros(s, np.float32)
    Np, Ep, Lp = store.node_feats.shape[0], store.edge_src.shape[0], \
        store.lg_src.shape[0]
    return GraphBatch(
        nodes=store.node_feats.astype(dtype),
        node_graph=np.concatenate(batch_vec).astype(np.int32),
        edge_src=np.concatenate(srcs).astype(np.int32),
        edge_dst=np.concatenate(dsts).astype(np.int32),
        edge_attr=store.edge_attr.astype(dtype),
        edge_mask=np.ones(Ep, np.float32),
        lg_src=np.concatenate(lsrcs).astype(np.int32),
        lg_dst=np.concatenate(ldsts).astype(np.int32),
        lg_attr=store.lg_attr.astype(dtype),
        lg_mask=np.ones(Lp, np.float32),
        globals_=store.global_scalars.astype(dtype),
        sg_num=store.sg_num.astype(np.int32),
        y=store.y.astype(np.float32),
        graph_mask=np.ones(G, np.float32),
        weight=np.ones(G, np.float32),
        sample_index=np.arange(G, dtype=np.int32),
        # table/CSR fields unused by conv_impl='coo'
        node_in_edges=z(Np, 1), node_in_mask=zf(Np, 1),
        edge_table_pos=z(Ep), lg_in_edges=z(Ep, 1), lg_in_mask=zf(Ep, 1),
        lg_table_pos=z(Lp), node_out_edges=z(Np, 1), node_out_mask=zf(Np, 1),
        lg_out_edges=z(Ep, 1), lg_out_mask=zf(Ep, 1),
        edge_src_order=z(Ep), edge_src_starts=z(Np),
        lg_src_order=z(Lp), lg_src_starts=z(Ep),
        edge_row_ptr=z(Np + 1), lg_row_ptr=z(Ep + 1),
        y_mask=np.ones((G, store.y.shape[1]), np.float32))


class TestTorchActivationParity:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(12)
        store = make_store(6, seed=4)
        hidden, layers, heads, tdim = 16, 3, 2, 2
        gdim = store.global_scalar_dim + N_SG
        sd = _torch_member_state(rng, store.node_dim, store.edge_dim,
                                 store.angle_dim, gdim, hidden, layers, tdim)
        params, cfg = convert_member_state(sd, heads=heads, dropout=0.0)
        model = RefHetero(node_dim=store.node_dim, edge_dim=store.edge_dim,
                          angle_dim=store.angle_dim, global_dim=gdim,
                          target_dim=tdim, hidden=hidden, layers=layers,
                          heads=heads)
        model.load_state_dict(sd)
        model.double().eval()
        return store, sd, params, cfg, model

    def test_per_layer_activations_allclose_fp64(self, setup):
        store, _, params, cfg, model = setup
        import dataclasses as dc

        batch = _unpadded_batch(store)
        ei = torch.from_numpy(np.stack([np.asarray(batch.edge_src),
                                        np.asarray(batch.edge_dst)])).long()
        li = torch.from_numpy(np.stack([np.asarray(batch.lg_src),
                                        np.asarray(batch.lg_dst)])).long()
        sg = np.zeros((store.n_graphs, N_SG))
        sg[np.arange(store.n_graphs), store.sg_num - 1] = 1.0
        with torch.no_grad():
            ref = model.forward_with_activations(
                torch.from_numpy(np.asarray(batch.nodes)), ei,
                torch.from_numpy(np.asarray(batch.edge_attr)), li,
                torch.from_numpy(np.asarray(batch.lg_attr)),
                torch.from_numpy(np.asarray(batch.node_graph)).long(),
                torch.from_numpy(store.global_scalars.astype(np.float64)),
                torch.from_numpy(sg))

        with jax.enable_x64():
            p64 = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64),
                               params)
            ours = alignn_activations(
                p64, dc.replace(cfg, conv_impl="coo"), batch)
            ours = {k: np.asarray(v) for k, v in ours.items()}

        assert set(ref.keys()) == set(ours.keys())
        for name in ref:
            np.testing.assert_allclose(
                ours[name], ref[name].numpy(), rtol=1e-9, atol=1e-11,
                err_msg=f"activation {name!r} diverges from the reference "
                        "semantics")

    def test_f32_packed_forward_matches_torch(self, setup):
        """End-to-end wiring check: the production path (packed/padded batch,
        table conv, f32) agrees with the torch reference to f32 tolerance."""
        store, _, params, cfg, model = setup
        import dataclasses as dc

        from gnnep_tpu.data.batching import BatchBudget, BatchPacker
        from gnnep_tpu.models.alignn import alignn_apply

        budget = BatchBudget.plan(store, range(store.n_graphs),
                                  batch_size=store.n_graphs)
        packed = next(iter(BatchPacker(store, budget).pack(
            range(store.n_graphs))))
        mean, logvar = alignn_apply(params, dc.replace(cfg, conv_impl="table"),
                                    packed)
        gm = np.asarray(packed.graph_mask) > 0
        order = np.asarray(packed.sample_index)[gm]

        batch = _unpadded_batch(store)
        ei = torch.from_numpy(np.stack([np.asarray(batch.edge_src),
                                        np.asarray(batch.edge_dst)])).long()
        li = torch.from_numpy(np.stack([np.asarray(batch.lg_src),
                                        np.asarray(batch.lg_dst)])).long()
        sg = np.zeros((store.n_graphs, N_SG))
        sg[np.arange(store.n_graphs), store.sg_num - 1] = 1.0
        with torch.no_grad():
            ref = model.forward_with_activations(
                torch.from_numpy(np.asarray(batch.nodes)), ei,
                torch.from_numpy(np.asarray(batch.edge_attr)), li,
                torch.from_numpy(np.asarray(batch.lg_attr)),
                torch.from_numpy(np.asarray(batch.node_graph)).long(),
                torch.from_numpy(store.global_scalars.astype(np.float64)),
                torch.from_numpy(sg))
        np.testing.assert_allclose(np.asarray(mean)[gm],
                                   ref["mean"].numpy()[order],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(logvar)[gm],
                                   ref["logvar"].numpy()[order],
                                   rtol=2e-4, atol=2e-5)
