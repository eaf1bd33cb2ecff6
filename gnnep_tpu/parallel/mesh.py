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
