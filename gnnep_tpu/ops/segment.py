"""Segment reductions — the scatter/gather primitives of message passing.

These are the TPU-native equivalents of the torch-scatter kernels the
reference outsources its hot path to (SURVEY.md §2g): XLA lowers
`segment_sum` over sorted/unsorted int32 ids to efficient scatter-adds, and
the Pallas kernels in `gnnep_tpu.ops.pallas` provide fused alternatives for
the sorted-CSR case. All functions take a static `num_segments` so shapes
stay XLA-compatible.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


@jax.custom_vjp
def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`x[idx]` with a segment-sum backward.

    XLA transposes a plain gather into a scatter-add, which TPUs execute
    row-serially under duplicate indices — catastrophic for message passing
    (every edge gathers its endpoint rows, so indices are *all* duplicates).
    Routing the cotangent through sort-based `segment_sum` instead keeps the
    backward pass on the fast path (~1000× on a v5e for E≈64k gathers).
    """
    return x[idx]


def _gather_rows_fwd(x, idx):
    return x[idx], (idx, x.shape[0])


def _gather_rows_bwd(res, g):
    idx, n = res
    return jax.ops.segment_sum(g, idx, num_segments=n), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 indices_are_sorted: bool = False) -> jnp.ndarray:
    """Mean over segments; empty segments yield 0."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = False) -> jnp.ndarray:
    """Max over segments; empty segments yield a large negative fill."""
    return jax.ops.segment_max(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int, mask: Optional[jnp.ndarray] = None,
                    indices_are_sorted: bool = False) -> jnp.ndarray:
    """Numerically stable softmax within segments (scatter-softmax).

    `logits` is [E, ...] with segment ids over the leading axis; `mask`
    (same leading shape, 1.0 = valid) zeroes masked entries' probability.
    Segments with no valid entries produce zeros.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
        logits = jnp.where(m > 0, logits, _NEG_INF)
    # the max stabilizer carries no gradient (softmax is shift-invariant),
    # and segment_max's transpose is a slow TPU scatter — detach it
    seg_max = segment_max(jax.lax.stop_gradient(logits), segment_ids,
                          num_segments, indices_are_sorted)
    seg_max = jax.lax.stop_gradient(jnp.maximum(seg_max, _NEG_INF))
    shifted = logits - gather_rows(seg_max, segment_ids)
    expd = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (expd.ndim - mask.ndim))
        # mask in the compute dtype — an f32 mask array would silently
        # promote a bf16 softmax (and everything downstream) to f32
        expd = expd * m.astype(expd.dtype)
    denom = segment_sum(expd, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return expd / gather_rows(denom, segment_ids)
