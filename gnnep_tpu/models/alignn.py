"""Heteroscedastic ALIGNN regressor as pure JAX functions over param pytrees.

Architecture parity with the reference model family
(`/root/reference/scripts/train.py:303-401,528-586`):

- 2-layer MLP encoders for node(206)→H, edge(36)→H, angle(11)→H
- L interleaved blocks: EdgeUpdate = β-gated transformer conv over the LINE
  graph with angle embeddings as edge features, then NodeUpdate = projection
  of the updated bond states + transformer conv over the ATOM graph (the
  ALIGNN coupling: angle → bond → atom within one layer)
- each block: LayerNorm → residual `state + dropout(relu(out))`
- segment-mean pooling over graphs, concat with 59 standardized global
  scalars + 230-way space-group one-hot, feat_proj MLP
- per-target mean and log-variance heads (heteroscedastic Gaussian)

Everything is shape-static: graphs arrive as padded `GraphBatch` arenas, the
space-group one-hot is expanded on device from an int index, and empty-graph
guards are data-dependent `where`s rather than Python branches.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.featurize import N_SG
from ..ops.graph_attention import (_torch_linear_init, init_transformer_conv,
                                   transformer_conv)
from ..ops.segment import segment_mean

Params = Dict[str, Any]

LN_EPS = 1e-5  # torch.nn.LayerNorm default


@dataclasses.dataclass(frozen=True)
class AlignnConfig:
    node_dim: int
    edge_dim: int
    angle_dim: int
    global_dim: int          # scalar globals + space-group one-hot (59 + 230)
    target_dim: int = 2
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    dropout: float = 0.15
    # 'table' = dense padded-adjacency aggregation (TPU fast path, no XLA
    # scatter); 'coo' = segment-op reference path (same math)
    conv_impl: str = "table"
    # Optional packer guarantees (0 = none): max edge rows owned by any
    # aligned group of 64 consecutive aggregation targets — atom-graph rows
    # per 64 nodes / line-graph rows per 64 bonds. They bound the Pallas
    # kernels' VMEM windows far below block·max_in_degree, cutting both
    # window DMA and window-matmul FLOPs (see PERF.md "window density").
    edge_win64: int = 0
    lg_win64: int = 0
    # src-side analogues for the SRC-sorted arenas consumed by the
    # gather-VJP windowed segment-sum (packer-asserted, not diluted)
    edge_src_win64: int = 0
    lg_src_win64: int = 0
    # roll the L interleaved blocks into one lax.scan over stacked layer
    # params. Measured trade (flagship, v5e): compile 78 s → 14 s, but the
    # step runs 10.8 → 13.1 ms (XLA stops pipelining across layer
    # boundaries), so the default is the unrolled loop; flip on for
    # compile-bound iteration. Numerically identical either way: both paths
    # derive each layer's 4 dropout keys with one split(rng, 5)
    scan_layers: bool = False
    # Fused-kernel ladder (conv_impl='fused' only). Numerics-affecting code
    # paths are config state, not ambient env vars, so a checkpoint evaluated
    # elsewhere takes the same path it trained with:
    #   attn_fused — fully fused attention (q·k SDDMM in-kernel); off =
    #     external-logits aggregate boundary
    #   attn_eproj — in-kernel edge projection; off = kv+e boundary
    #   force_fused — keep Pallas kernels active off-TPU (interpret mode);
    #     testing knob, otherwise non-TPU backends downgrade to 'table'
    attn_fused: bool = True
    attn_eproj: bool = True
    force_fused: bool = False
    #   attn_span — node-space kv + in-kernel one-hot gather (span
    #     formulation): no [E, 2H] edge-space kv arena in either pass.
    #     Requires the pack-time span bounds below (0 = unavailable → the
    #     eproj path runs instead). Bounds come from
    #     `data.batching.measure_span64` on packed batches.
    attn_span: bool = False
    edge_span64: int = 0
    lg_span64: int = 0

    def __post_init__(self):
        if self.heads <= 0:
            raise ValueError("heads must be positive")
        if self.target_dim <= 0:
            raise ValueError("target_dim must be positive")
        if self.hidden % self.heads != 0:
            raise ValueError("hidden size must be divisible by number of heads")


def _init_mlp(rng, in_dim: int, hidden: int) -> Params:
    k0, k1 = jax.random.split(rng)
    w0, b0 = _torch_linear_init(k0, in_dim, hidden)
    w1, b1 = _torch_linear_init(k1, hidden, hidden)
    return {"w0": w0, "b0": b0, "w1": w1, "b1": b1}


def _mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x @ p["w0"] + p["b0"]) @ p["w1"] + p["b1"]


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def init_alignn(rng: jax.Array, cfg: AlignnConfig) -> Params:
    keys = jax.random.split(rng, 7 + 2 * cfg.layers)
    h = cfg.hidden
    params: Params = {
        "node_enc": _init_mlp(keys[0], cfg.node_dim, h),
        "edge_enc": _init_mlp(keys[1], cfg.edge_dim, h),
        "angle_enc": _init_mlp(keys[2], cfg.angle_dim, h),
        "edge_blocks": [],
        "node_blocks": [],
    }
    for i in range(cfg.layers):
        params["edge_blocks"].append({
            "conv": init_transformer_conv(keys[7 + 2 * i], h, h, edge_dim=h),
            "ln_scale": jnp.ones(h), "ln_bias": jnp.zeros(h),
        })
        kp, kc = jax.random.split(keys[8 + 2 * i])
        pw, pb = _torch_linear_init(kp, h, h)
        params["node_blocks"].append({
            "edge_proj_w": pw, "edge_proj_b": pb,
            "conv": init_transformer_conv(kc, h, h, edge_dim=h),
            "ln_scale": jnp.ones(h), "ln_bias": jnp.zeros(h),
        })
    fw, fb = _torch_linear_init(keys[3], h + cfg.global_dim, h)
    params["feat_proj"] = {"w": fw, "b": fb}
    mw, mb = _torch_linear_init(keys[4], h, cfg.target_dim)
    params["mean_head"] = {"w": mw, "b": mb}
    lw, lb = _torch_linear_init(keys[5], h, cfg.target_dim)
    params["logvar_head"] = {"w": lw, "b": lb}
    return params


def _dropout(x: jnp.ndarray, rate, rng: Optional[jax.Array]) -> jnp.ndarray:
    # `rate` may be a traced scalar (per-member dropout under vmap/shard
    # member-parallelism); only a concretely-zero rate skips the mask
    if rng is None or (isinstance(rate, (int, float)) and rate <= 0.0):
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype), 0.0)


def _shared_trunk(params: Params, cfg: AlignnConfig, batch, *,
                  train: bool, rng: Optional[jax.Array],
                  dropout_override=None, tap=None) -> jnp.ndarray:
    """Encoders → interleaved LG/atom convs → pooling → feat_proj. Returns [G, H].

    `tap`: optional callback `(name, array) -> None` recording intermediate
    activations (encoders, per-layer edge/node states, pooled features) —
    the per-layer parity hook used by `alignn_activations`. Unsupported
    under `scan_layers` (the loop body is traced once)."""
    if not train:
        drop = 0.0
    elif dropout_override is not None:
        drop = dropout_override
    else:
        drop = cfg.dropout

    def next_key():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    node_state = _mlp(params["node_enc"], batch.nodes)
    edge_state = _mlp(params["edge_enc"], batch.edge_attr)
    angle_emb = _mlp(params["angle_enc"], batch.lg_attr)
    if tap is not None:
        tap("node_enc", node_state)
        tap("edge_enc", edge_state)
        tap("angle_enc", angle_emb)

    has_lg = jnp.sum(batch.lg_mask) > 0
    has_edges = jnp.sum(batch.edge_mask) > 0

    use_table = cfg.conv_impl in ("table", "fused")
    if use_table:
        from ..ops.dense_attention import transformer_conv_table

        # fused checkpoints remain loadable off-TPU: interpret-mode Pallas is
        # far slower than the XLA table path, so downgrade transparently
        # (cfg.force_fused keeps the kernel active for off-TPU testing)
        fused = cfg.conv_impl == "fused" and (
            jax.default_backend() == "tpu" or cfg.force_fused)

        attn_span = getattr(cfg, "attn_span", False)

        def lg_conv(p, state, feats, rng):
            return transformer_conv_table(
                p, state, batch.lg_src, batch.lg_dst, feats,
                batch.lg_in_edges, batch.lg_in_mask, batch.lg_table_pos,
                batch.lg_out_edges, batch.lg_out_mask,
                batch.lg_src_order, batch.lg_src_starts,
                heads=cfg.heads, edge_mask=batch.lg_mask,
                dropout_rate=drop, dropout_rng=rng, fused=fused,
                win64=cfg.lg_win64, src_win64=cfg.lg_src_win64,
                row_ptr=getattr(batch, "lg_row_ptr", None),
                attn_fused=cfg.attn_fused, attn_eproj=cfg.attn_eproj,
                force_fused=cfg.force_fused, attn_span=attn_span,
                span_lo=getattr(batch, "bond_span_lo", None),
                span64=getattr(cfg, "lg_span64", 0))

        def atom_conv(p, state, feats, rng):
            return transformer_conv_table(
                p, state, batch.edge_src, batch.edge_dst, feats,
                batch.node_in_edges, batch.node_in_mask, batch.edge_table_pos,
                batch.node_out_edges, batch.node_out_mask,
                batch.edge_src_order, batch.edge_src_starts,
                heads=cfg.heads, edge_mask=batch.edge_mask,
                dropout_rate=drop, dropout_rng=rng, fused=fused,
                win64=cfg.edge_win64, src_win64=cfg.edge_src_win64,
                row_ptr=getattr(batch, "edge_row_ptr", None),
                attn_fused=cfg.attn_fused, attn_eproj=cfg.attn_eproj,
                force_fused=cfg.force_fused, attn_span=attn_span,
                span_lo=getattr(batch, "node_span_lo", None),
                span64=getattr(cfg, "edge_span64", 0))
    else:
        def lg_conv(p, state, feats, rng):
            return transformer_conv(
                p, state, batch.lg_src, batch.lg_dst, feats,
                heads=cfg.heads, edge_mask=batch.lg_mask,
                dropout_rate=drop, dropout_rng=rng)

        def atom_conv(p, state, feats, rng):
            return transformer_conv(
                p, state, batch.edge_src, batch.edge_dst, feats,
                heads=cfg.heads, edge_mask=batch.edge_mask,
                dropout_rate=drop, dropout_rng=rng)

    def layer_pair(edge_state, node_state, eb, nb, keys):
        # EdgeUpdate: line-graph conv with angle features (train.py:303-317)
        # conv outputs pinned to the state dtype: scan_layers carries
        # (edge_state, node_state) through lax.scan, whose carry dtypes
        # must be loop-invariant — an impl that computes (parts of) the
        # conv in f32 must not leak the promotion into the bf16 trunk
        out = lg_conv(eb["conv"], edge_state, angle_emb,
                      keys[0]).astype(edge_state.dtype)
        out = _layer_norm(out, eb["ln_scale"], eb["ln_bias"])
        updated = edge_state + _dropout(jax.nn.relu(out), drop, keys[1])
        edge_state = jnp.where(has_lg, updated, edge_state)

        # NodeUpdate: atom conv fed by projected bond states (train.py:320-336)
        edge_feat = edge_state @ nb["edge_proj_w"] + nb["edge_proj_b"]
        out = atom_conv(nb["conv"], node_state, edge_feat,
                        keys[2]).astype(node_state.dtype)
        out = _layer_norm(out, nb["ln_scale"], nb["ln_bias"])
        updated = node_state + _dropout(jax.nn.relu(out), drop, keys[3])
        node_state = jnp.where(has_edges, updated, node_state)
        return edge_state, node_state

    if getattr(cfg, "scan_layers", False) and cfg.layers > 1:
        if tap is not None:
            raise ValueError("activation taps require scan_layers=False")
        eb_s = jax.tree.map(lambda *xs: jnp.stack(xs), *params["edge_blocks"])
        nb_s = jax.tree.map(lambda *xs: jnp.stack(xs), *params["node_blocks"])

        def body(carry, lp):
            e_st, n_st, r = carry
            if r is None:
                keys = (None,) * 4
            else:
                r, *keys = jax.random.split(r, 5)
            e_st, n_st = layer_pair(e_st, n_st, lp[0], lp[1], tuple(keys))
            return (e_st, n_st, r), None

        (edge_state, node_state, rng), _ = jax.lax.scan(
            body, (edge_state, node_state, rng), (eb_s, nb_s))
    else:
        for li, (eb, nb) in enumerate(zip(params["edge_blocks"],
                                          params["node_blocks"])):
            if rng is None:
                keys = (None,) * 4
            else:
                rng, *keys = jax.random.split(rng, 5)
            edge_state, node_state = layer_pair(edge_state, node_state, eb,
                                                nb, tuple(keys))
            if tap is not None:
                tap(f"layer{li}_edge", edge_state)
                tap(f"layer{li}_node", node_state)

    n_graphs = batch.y.shape[0]
    pooled = segment_mean(node_state, batch.node_graph, n_graphs + 1)[:n_graphs]
    sg_one_hot = jax.nn.one_hot(batch.sg_num - 1, N_SG, dtype=pooled.dtype)
    feats = jnp.concatenate([pooled, batch.globals_, sg_one_hot], axis=-1)
    feats = _dropout(feats, drop, next_key())
    shared = jax.nn.relu(feats @ params["feat_proj"]["w"] + params["feat_proj"]["b"])
    shared = _dropout(shared, drop, next_key())
    if tap is not None:
        tap("pooled", pooled)
        tap("shared", shared)
    return shared


def alignn_apply(params: Params, cfg: AlignnConfig, batch, *,
                 train: bool = False, rng: Optional[jax.Array] = None,
                 dropout_override=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass → (mean [G,T], logvar [G,T]) in transformed target space.

    `dropout_override`: optional (possibly traced) scalar replacing
    cfg.dropout during training — per-member rates under vmap/shard
    member-parallelism with a single compilation."""
    shared = _shared_trunk(params, cfg, batch, train=train, rng=rng,
                           dropout_override=dropout_override)
    mean = shared @ params["mean_head"]["w"] + params["mean_head"]["b"]
    logvar = shared @ params["logvar_head"]["w"] + params["logvar_head"]["b"]
    return mean, logvar


def alignn_embed(params: Params, cfg: AlignnConfig, batch) -> jnp.ndarray:
    """Penultimate embedding (train.py:576-577), used by KNN density weighting."""
    return _shared_trunk(params, cfg, batch, train=False, rng=None)


def alignn_activations(params: Params, cfg: AlignnConfig, batch
                       ) -> Dict[str, jnp.ndarray]:
    """Eval forward recording every intermediate activation.

    Returns {node_enc, edge_enc, angle_enc, layer{i}_edge, layer{i}_node,
    pooled, shared, mean, logvar} — the per-layer parity surface against the
    reference model's `_shared` stages (train.py:537-586), used by
    `tests/test_torch_parity.py` to close the BASELINE "per-layer
    activations (allclose)" requirement. Forces the unrolled layer loop."""
    acts: Dict[str, jnp.ndarray] = {}
    run_cfg = (dataclasses.replace(cfg, scan_layers=False)
               if getattr(cfg, "scan_layers", False) else cfg)
    shared = _shared_trunk(params, run_cfg, batch, train=False, rng=None,
                           tap=acts.__setitem__)
    acts["mean"] = shared @ params["mean_head"]["w"] + params["mean_head"]["b"]
    acts["logvar"] = (shared @ params["logvar_head"]["w"]
                      + params["logvar_head"]["b"])
    return acts


def config_from_params(params: Params, *, edge_dim: int, angle_dim: int,
                       global_dim: int, heads: int, dropout: float = 0.0,
                       ) -> AlignnConfig:
    """Infer architecture from parameter shapes (checkpoints are the
    architecture contract, as in reference evaluate.py:146-176)."""
    node_dim, hidden = params["node_enc"]["w0"].shape
    layers = len(params["edge_blocks"])
    target_dim = params["mean_head"]["w"].shape[1]
    return AlignnConfig(node_dim=node_dim, edge_dim=edge_dim, angle_dim=angle_dim,
                        global_dim=global_dim, target_dim=target_dim,
                        hidden=hidden, layers=layers, heads=heads, dropout=dropout)
