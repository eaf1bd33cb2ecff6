"""Multi-head graph transformer convolution (UniMP-style) as a pure function.

Functionally equivalent to the β-gated, edge-featured attention conv the
reference uses via PyG `TransformerConv(hidden, hidden//heads, heads,
edge_dim=hidden, beta=True)` (`/root/reference/scripts/train.py:308,326`),
re-derived for static-shape padded batches:

    q_i = x_i W_q + b_q            (target node / bond)
    k_j = x_j W_k + b_k            (source)
    v_j = x_j W_v + b_v
    e   = edge_attr W_e            (no bias)
    α_e = softmax_{e: dst(e)=i} ( q_i · (k_j + e) / √C )   per head
    m_i = Σ_e α_e (v_j + e)
    r_i = x_i W_skip + b_skip
    β_i = σ([r_i ‖ m_i ‖ r_i − m_i] W_β)                   (no bias, scalar)
    out = β_i r_i + (1 − β_i) m_i

Padded edges point at the reserved dummy slot, so masking falls out of the
batch conventions; an explicit `edge_mask` additionally hard-zeroes their
attention so the dummy row's contents never matter.

The dense projections are MXU-friendly [E,H]×[H,H] GEMMs that XLA fuses; the
gather → segment-softmax → segment-sum mid-section is the part the Pallas
kernels replace on TPU (`gnnep_tpu.ops.pallas`).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .segment import gather_rows, segment_softmax, segment_sum


class TransformerConvParams(NamedTuple):
    w_query: jnp.ndarray  # [H_in, H]
    b_query: jnp.ndarray  # [H]
    w_key: jnp.ndarray
    b_key: jnp.ndarray
    w_value: jnp.ndarray
    b_value: jnp.ndarray
    w_edge: jnp.ndarray   # [F_e, H]  (bias-free, PyG convention)
    w_skip: jnp.ndarray   # [H_in, H]
    b_skip: jnp.ndarray
    w_beta: jnp.ndarray   # [3H, 1]   (bias-free)


def beta_blend(w_beta: jnp.ndarray, r: jnp.ndarray,
               msg: jnp.ndarray) -> jnp.ndarray:
    """β-gated skip blend shared by every conv formulation.

    The reference formulation `sigmoid([r ‖ msg ‖ r−msg] @ w_beta)`
    (PyG TransformerConv beta=True) is evaluated algebraically as
    `sigmoid(r @ (w₁+w₃) + msg @ (w₂−w₃))` — identical math modulo fp
    reassociation, but no [·, 3H] concat tensor ever materializes and the
    3H-wide GEMV becomes two H-wide ones (the concat is a pure layout
    artifact of the torch module's single Linear)."""
    h = r.shape[-1]
    w1, w2, w3 = w_beta[:h], w_beta[h:2 * h], w_beta[2 * h:]
    beta = jax.nn.sigmoid(r @ (w1 + w3) + msg @ (w2 - w3))
    return beta * r + (1.0 - beta) * msg


def _torch_linear_init(rng, fan_in: int, fan_out: int, with_bias: bool = True):
    """torch.nn.Linear default init: U(±1/√fan_in) for weight and bias."""
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(rng)
    w = jax.random.uniform(k_w, (fan_in, fan_out), minval=-bound, maxval=bound)
    if not with_bias:
        return w
    b = jax.random.uniform(k_b, (fan_out,), minval=-bound, maxval=bound)
    return w, b


def init_transformer_conv(rng, in_dim: int, hidden: int,
                          edge_dim: int) -> TransformerConvParams:
    ks = jax.random.split(rng, 5)
    wq, bq = _torch_linear_init(ks[0], in_dim, hidden)
    wk, bk = _torch_linear_init(ks[1], in_dim, hidden)
    wv, bv = _torch_linear_init(ks[2], in_dim, hidden)
    we = _torch_linear_init(ks[3], edge_dim, hidden, with_bias=False)
    k_skip, k_beta = jax.random.split(ks[4])
    wskip, bskip = _torch_linear_init(k_skip, in_dim, hidden)
    wbeta = _torch_linear_init(k_beta, 3 * hidden, 1, with_bias=False)
    return TransformerConvParams(wq, bq, wk, bk, wv, bv, we, wskip, bskip, wbeta)


def transformer_conv(
    params: TransformerConvParams,
    x: jnp.ndarray,            # [N, H_in] node (or bond) states
    src: jnp.ndarray,          # [E] int32 message sources
    dst: jnp.ndarray,          # [E] int32 aggregation targets
    edge_attr: jnp.ndarray,    # [E, F_e] per-edge features
    *,
    heads: int,
    edge_mask: Optional[jnp.ndarray] = None,  # [E] 1.0 = real
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    n = x.shape[0]
    hidden = params.w_query.shape[1]
    ch = hidden // heads

    q = (x @ params.w_query + params.b_query).reshape(n, heads, ch)
    k = (x @ params.w_key + params.b_key).reshape(n, heads, ch)
    v = (x @ params.w_value + params.b_value).reshape(n, heads, ch)
    e = (edge_attr @ params.w_edge).reshape(-1, heads, ch)

    k_j = gather_rows(k, src) + e
    v_j = gather_rows(v, src) + e
    logits = jnp.sum(gather_rows(q, dst) * k_j, axis=-1) / math.sqrt(ch)  # [E, heads]
    alpha = segment_softmax(logits, dst, n, mask=edge_mask)      # [E, heads]
    # dropout_rate may be traced (per-member rates); only a concrete zero
    # skips the mask
    if dropout_rng is not None and not (
            isinstance(dropout_rate, (int, float)) and dropout_rate <= 0.0):
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)
    msg = segment_sum(alpha[..., None] * v_j, dst, n).reshape(n, hidden)

    r = x @ params.w_skip + params.b_skip
    return beta_blend(params.w_beta, r, msg)
