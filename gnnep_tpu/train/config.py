"""Training configuration — the framework's equivalent of the reference's
argparse surface (`/root/reference/scripts/train.py:1079-1212`), as a typed
dataclass usable programmatically and from the CLI."""
from __future__ import annotations

import dataclasses
from typing import List, Optional

from .loop import MIN_LOGVAR_FLOOR


@dataclasses.dataclass
class TrainConfig:
    data_dir: str = "data/mp_gnn"
    save_dir: str = "artifacts/ensemble"
    batch_size: int = 64
    epochs: int = 60
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    dropout: float = 0.15
    ensemble_size: int = 5
    member_dropouts: Optional[List[float]] = None
    member_lrs: Optional[List[float]] = None
    member_hiddens: Optional[List[int]] = None

    # splits
    seed: int = 42
    val_frac: float = 0.1
    calib_frac: float = 0.05
    test_frac: float = 0.1

    # optimizer / schedules
    lr: float = 3e-4
    lr_min: float = 1e-5
    weight_decay: float = 1e-4
    warmup_epochs: int = 2
    sigma_warmup_epochs: int = 8
    sigma_lr_max: float = 3e-4
    optimizer: str = "adamw"

    # loss / regularization
    min_logvar_floor: float = MIN_LOGVAR_FLOOR
    log_sigma_l2: float = 0.1
    feature_jitter_std: float = 0.1
    freq_bins: int = 6
    freq_gamma: float = 0.0
    relative_eps: float = 1e-6

    # early stopping / selection
    early_stop: int = 20
    delta_mae: float = 1.0
    delta_mae_reset: float = 1.0
    delta_ece: float = 0.01
    delta_coverage: float = 0.02

    # bootstrap / data
    bootstrap: bool = True
    bootstrap_ratio: float = 1.3
    train_subset_ratio: float = 1.0
    use_mat2vec: bool = True

    # calibration
    conformal_alpha: float = 0.1
    conformal_method: str = "scaled"

    # KNN density weighting (opt-in, reference train.py:1178-1192)
    enable_density_weighting: bool = False
    weight_warmup_epochs: int = 8
    knn_k: int = 20
    knn_eps: float = 1e-6
    knn_alpha: float = 0.75
    knn_beta: float = 1.0
    knn_weight_min: float = 0.2
    knn_weight_max: float = 1.0
    knn_refresh: int = 5
    knn_coverage_audit: bool = False     # audit weight-map coverage over the
                                         # train batches before activation
    knn_coverage_max_batches: int = 0    # 0 = audit the full train set

    # framework extensions (no reference analogue)
    conv_impl: str = "table"             # 'table' | 'fused' (Pallas) | 'coo'
    attn_fused: bool = True              # fused-kernel ladder (conv_impl
    attn_eproj: bool = True              # 'fused'): see AlignnConfig
    scan_layers: bool = False            # lax.scan over layers: ~5× faster
                                         # compile, ~20% slower step
    prng_impl: str = "rbg"               # dropout/jitter PRNG: 'rbg' (fast
                                         # on TPU) | 'threefry2x32'
    pack_workers: int = 4                # threads for epoch batch assembly
                                         # (host packing otherwise caps fast
                                         # chips); 1 = serial packer
    compute_dtype: str = "float32"       # 'float32' | 'bfloat16'
    flat_opt: bool = False               # raveled optimizer tail (A/B knob)
    checkpoint_every: int = 0            # save mid-training state every N epochs
    resume: bool = False                 # resume member training from checkpoints
    member_parallel: str = "sequential"  # 'sequential' | 'vmap' (one device,
                                         # table conv) | 'shard' (one member
                                         # per device, fused kernels)
    # production distributed training (SURVEY §2g): each member trains over
    # a Mesh(("data","edge")) of data_shards × edge_shards devices via the
    # graph-aligned multi-chip step — one packed sub-batch per device slot,
    # one fused grads+metrics psum per optimizer step. Effective batch per
    # optimizer step = data_shards × edge_shards × batch_size graphs.
    # Requires that many visible devices; composes with scan_steps, resume,
    # checkpointing, KNN weighting, and calibration. 1 × 1 = single-device.
    data_shards: int = 1
    edge_shards: int = 1
    # giant-graph routing: 'error' keeps the budget's cover-all guarantee
    # (one outlier graph balloons every batch's arenas; a graph failing a
    # fresh budget raises in the packer). 'boundary' sizes the budget to
    # TYPICAL batch statistics and routes graphs that do not fit through
    # the boundary-exchange edge partition (parallel/giant.py): each giant
    # trains as its own boundary-partitioned step over edge_shards ranks
    # and its fold-val/calib/test predictions come from the boundary
    # forward. SURVEY.md §2g — the CP-analogue exists precisely for graphs
    # the packer cannot hold.
    giant_graphs: str = "error"
    member_isolation: str = "none"       # 'none' | 'process': train each
                                         # member in a subprocess. Mitigates
                                         # the tunneled-TPU-client host-
                                         # transfer leak (PERF.md round 4:
                                         # every device_put leaks its host
                                         # mirror — ~1.8 GB/epoch at
                                         # flagship scale, OOM over a long
                                         # ensemble run); the leak dies with
                                         # each member's process. Compile
                                         # cache makes re-warm cheap.
    # device-side inner loop: run K optimizer steps per dispatch via
    # lax.scan over stacked batches (host dispatch + per-step metric
    # readback otherwise gate throughput on remote runtimes); the epoch's
    # remainder (< K batches) runs per-step. 0/1 disables.
    scan_steps: int = 8
    profile_dir: str = ""                # jax.profiler trace output (first epoch)
    save_embeddings: bool = False
    batch_quantile: float = 0.95
    batch_slack: float = 1.15
    verbose: bool = True

    def member_override(self, values: Optional[List], i: int, default):
        if values is None:
            return default
        if len(values) != self.ensemble_size:
            raise ValueError(
                f"Per-member override expects {self.ensemble_size} entries, got {len(values)}")
        return values[i]
