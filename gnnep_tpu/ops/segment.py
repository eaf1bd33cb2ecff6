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
    seg_max = segment_max(logits, segment_ids, num_segments, indices_are_sorted)
    seg_max = jnp.maximum(seg_max, _NEG_INF)  # empty segments: avoid -inf propagation
    shifted = logits - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (expd.ndim - mask.ndim))
        expd = expd * m
    denom = segment_sum(expd, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return expd / denom[segment_ids]
