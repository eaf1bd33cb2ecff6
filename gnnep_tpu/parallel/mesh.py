"""Device-mesh construction for the framework's parallel axes.

Axes (SURVEY.md §2g — all new surface relative to the single-GPU reference):
- "data": data parallelism over graphs; gradients all-reduced across it
- "edge": edge partitioning *within* a batch — the graph-world analogue of
  sequence/context parallelism; bond/angle message contributions are
  aggregated with psums that ride ICI

Ensemble-member parallelism is orthogonal (vmap over a stacked parameter
axis, `gnnep_tpu.parallel.ensemble_vmap`) and can be mapped onto the "data"
axis of this mesh when members outnumber chips.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
EDGE_AXIS = "edge"


# jax ≥ 0.8 promotes shard_map out of experimental and renames the
# replication checker (check_rep → check_vma); the experimental module
# still works but warns and will be removed. Detect the API ONCE here —
# a per-call try/except would swallow genuine wrap-time argument errors
_HAS_JAX_SHARD_MAP = hasattr(jax, "shard_map")


def shard_map(f, *, mesh, in_specs, out_specs, check: bool = False):
    """`jax.shard_map` across JAX versions.

    All the framework's per-device programs build manual collectives whose
    outputs the replication checker cannot always type (same reason the
    reference formulations passed check_rep=False), so the default is
    off."""
    if _HAS_JAX_SHARD_MAP:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check)
    from jax.experimental.shard_map import shard_map as _sm
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=check)


def make_mesh(n_data: Optional[int] = None, n_edge: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over (data × edge). Defaults to all devices on the data axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_edge
    if n_data * n_edge != len(devs):
        raise ValueError(f"n_data ({n_data}) × n_edge ({n_edge}) "
                         f"!= device count ({len(devs)})")
    grid = np.asarray(devs).reshape(n_data, n_edge)
    return Mesh(grid, (DATA_AXIS, EDGE_AXIS))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime (DCN-connected hosts).

    On managed TPU pods the arguments auto-detect; on bare hosts pass the
    coordinator address explicitly. Idempotent: a second call is a no-op
    (checked via `jax.distributed.is_initialized`, not exception-message
    string matching). Exercised end-to-end by the 2-process localhost test
    (tests/test_multihost.py) and the pod runbook in ARCHITECTURE.md.
    """
    import jax

    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(n_edge: int = 1) -> Mesh:
    """Pod-slice mesh: hosts (DCN) map onto the outer data axis, the
    edge-partition axis stays within a host's ICI domain.

    Layout rationale: gradient psums on the data axis tolerate DCN latency
    (once per step), while the per-conv pmax/psum pairs of edge partitioning
    (several per layer) must ride ICI — so the edge axis is always the inner,
    intra-host axis.
    """
    import jax

    devs = jax.devices()
    local = jax.local_device_count()
    if n_edge > local or local % n_edge:
        raise ValueError(f"n_edge ({n_edge}) must divide the local device "
                         f"count ({local}) so edge collectives stay on ICI")
    n_data = len(devs) // n_edge
    grid = np.asarray(devs).reshape(n_data, n_edge)
    return Mesh(grid, (DATA_AXIS, EDGE_AXIS))
