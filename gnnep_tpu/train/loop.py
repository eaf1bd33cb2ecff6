"""Jitted training/eval steps: heteroscedastic NLL, AdamW with dual LR groups.

The reference's training numerics (`/root/reference/scripts/train.py:607-723,
1215-1232,1516-1545`) recast as pure functions:

- loss = mean over real graphs of mean-over-targets of ½(logvar + diff²/var),
  logvar clamped at the floor (−2.9 default), optional per-sample weights,
  plus λ·mean((½logvar)²) log-σ L2
- Gaussian feature jitter on node/global features (train-time augmentation)
- global-norm gradient clip at 5.0
- AdamW where the logvar head gets its own learning rate ("sigma" group with
  separate warmup), implemented as scale_by_adam + a per-leaf decoupled
  weight-decay update selected by a sigma mask — LRs are traced scalars so
  epoch-wise cosine schedules never retrigger compilation

Targets are transformed on device with the fitted log-transform constants
baked into the step closure.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.alignn import AlignnConfig, alignn_apply

MIN_LOGVAR_FLOOR = -2.9  # reference train.py:39


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Static loss/optimizer hyperparameters (baked into the jitted step)."""

    weight_decay: float = 1e-4
    log_sigma_l2: float = 0.1
    feature_jitter_std: float = 0.1
    min_logvar_floor: float = MIN_LOGVAR_FLOOR
    grad_clip: float = 5.0
    # 'adamw' (decoupled weight decay, reference default) or 'adam'
    # (coupled L2 added to gradients, reference --optimizer adam)
    optimizer: str = "adamw"
    # 'float32' or 'bfloat16': compute dtype for the forward/backward pass
    # (parameters and optimizer state stay fp32 — the TPU analogue of the
    # reference's AMP autocast, train.py:632-636; no loss scaling needed)
    compute_dtype: str = "float32"
    # run the clip/Adam/update tail on one raveled parameter vector instead
    # of per-leaf trees. Fewer HLO ops, but on TPU the ravel/unravel forces
    # tiled-layout relinearization copies each step, which measured SLOWER
    # at flagship scale (12.0 vs 9.5 ms/step) — keep False unless an A/B on
    # the target hardware says otherwise. Changes opt_state's pytree shape.
    flat_opt: bool = False


def _cast_for_compute(params, batch, dtype):
    """Cast params + feature arrays to the compute dtype (bf16 fast path)."""
    if dtype == jnp.float32:
        return params, batch
    params = jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params)
    batch = batch._replace(
        nodes=batch.nodes.astype(dtype),
        edge_attr=batch.edge_attr.astype(dtype),
        lg_attr=batch.lg_attr.astype(dtype),
        globals_=batch.globals_.astype(dtype))
    return params, batch


class StepMetrics(NamedTuple):
    loss_sum: jnp.ndarray       # Σ per-sample weighted NLL (real graphs)
    n_graphs: jnp.ndarray
    abs_err_sum: jnp.ndarray    # Σ |pred − y| linear space, real elements
    sq_err_sum: jnp.ndarray
    n_elements: jnp.ndarray
    logvar_sum: jnp.ndarray
    max_var: jnp.ndarray


def prng_key(seed: int, impl: Optional[str] = None) -> jax.Array:
    """Training PRNG key. Default impl is 'rbg' (XLA RngBitGenerator),
    which generates dropout/jitter masks much cheaper than threefry on TPU
    (~0.1 ms/step at the flagship bench config; up to ~1.5 ms on configs
    whose threefry generation can't overlap). Pass 'threefry2x32' for
    JAX's default stream (bit-reproducible across backends)."""
    if impl and impl != "default":
        # typed key arrays carry their impl through split/fold_in (a raw
        # uint32 PRNGKey(impl=...) array would be re-interpreted as the
        # default threefry impl at the first split)
        return jax.random.key(seed, impl=impl)
    return jax.random.PRNGKey(seed)


def cosine_lr(total_epochs: int, warmup_epochs: int, max_lr: float,
              min_lr: float):
    """Per-epoch LR: linear warmup then cosine to min_lr (train.py:1215-1232)."""
    warmup = max(int(warmup_epochs), 0)
    total = max(int(total_epochs), 1)
    if warmup >= total:
        warmup = max(total - 1, 0)
    if max_lr <= 0:
        raise ValueError("max_lr must be positive for cosine scheduling")
    min_factor = min(max(min_lr / max_lr, 0.0), 1.0)

    def lr_at(epoch_idx: int) -> float:
        if warmup > 0 and epoch_idx < warmup:
            factor = float(epoch_idx + 1) / warmup
        else:
            progress = float(epoch_idx - warmup) / float(max(total - warmup, 1))
            factor = min_factor + (1.0 - min_factor) * 0.5 * (1.0 + math.cos(math.pi * progress))
        return max_lr * factor

    return lr_at


def sigma_mask(params) -> Any:
    """Pytree of bools marking the sigma (logvar head) parameter group."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, _ in flat:
        keys = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        leaves.append("logvar_head" in keys)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def masked_sample_nll(nll: jnp.ndarray, y_mask: jnp.ndarray,
                      graph_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean NLL over VALID targets only — `y_mask` [G, T] is the
    authority on target validity (data/batching.py); a missing component's
    1.0 fill value must not be trained toward. Identical to
    `nll.mean(axis=1) * graph_mask` when every target is valid (the
    reference's case — it filters to fully-targeted samples)."""
    valid = jnp.maximum(y_mask.sum(axis=1), 1.0)
    return (nll * y_mask).sum(axis=1) / valid * graph_mask


def nll_loss_sums(mean: jnp.ndarray, logvar: jnp.ndarray, batch,
                  mu: jnp.ndarray, sd: jnp.ndarray, hyper: TrainHyper):
    """Sum-form heteroscedastic NLL tail shared by every parallel loss
    (sharded / aligned / boundary train + grads): floor clamp, per-sample
    weights, y_mask-valid target averaging, log-σ L2. Returns
    (loss_sum, sample_loss_sum, n_real_graphs) — keeping this in ONE place
    so a semantics fix cannot diverge across formulations."""
    mean = mean.astype(jnp.float32)
    logvar = jnp.maximum(logvar.astype(jnp.float32), hyper.min_logvar_floor)
    y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd
    nll = 0.5 * (logvar + (mean - y_z) ** 2 / jnp.exp(logvar)) \
        * batch.weight[:, None]
    sample_loss = masked_sample_nll(nll, batch.y_mask, batch.graph_mask)
    loss_sum = sample_loss.sum()
    if hyper.log_sigma_l2 > 0.0:
        ls2 = ((0.5 * logvar) ** 2
               * batch.graph_mask[:, None]).sum() / y_z.shape[1]
        loss_sum = loss_sum + hyper.log_sigma_l2 * ls2
    return loss_sum, sample_loss.sum(), batch.graph_mask.sum()


def hetero_nll(params, cfg: AlignnConfig, hyper: TrainHyper, batch,
               y_z: jnp.ndarray, rng: Optional[jax.Array], train: bool,
               dropout_override=None):
    """Loss + raw stats. `y_z` are log-standardized targets [G, T].

    `dropout_override`: optional (possibly traced) scalar replacing
    cfg.dropout — lets vmap/shard member-parallelism express per-member
    dropout rates in one compilation."""
    if train and hyper.feature_jitter_std > 0.0 and rng is not None:
        rng, kx, kg, kd = jax.random.split(rng, 4)
        batch = batch._replace(
            nodes=batch.nodes + hyper.feature_jitter_std
            * jax.random.normal(kx, batch.nodes.shape),
            globals_=batch.globals_ + hyper.feature_jitter_std
            * jax.random.normal(kg, batch.globals_.shape))
    else:
        kd = rng
    dtype = jnp.bfloat16 if hyper.compute_dtype == "bfloat16" else jnp.float32
    c_params, c_batch = _cast_for_compute(params, batch, dtype)
    mean, logvar = alignn_apply(c_params, cfg, c_batch, train=train, rng=kd,
                                dropout_override=dropout_override)
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    logvar = jnp.maximum(logvar, hyper.min_logvar_floor)
    var = jnp.exp(logvar)
    diff = mean - y_z
    nll = 0.5 * (logvar + diff ** 2 / var)                     # [G, T]
    nll = nll * batch.weight[:, None]
    sample_loss = masked_sample_nll(nll, batch.y_mask, batch.graph_mask)
    n_real = jnp.maximum(batch.graph_mask.sum(), 1.0)
    loss = sample_loss.sum() / n_real
    if hyper.log_sigma_l2 > 0.0:
        log_sigma_sq = (0.5 * logvar) ** 2 * batch.graph_mask[:, None]
        loss = loss + hyper.log_sigma_l2 * log_sigma_sq.sum() / (n_real * y_z.shape[1])
    return loss, (mean, logvar, sample_loss)


def _make_step_body(cfg: AlignnConfig, hyper: TrainHyper, adam,
                    mu: jnp.ndarray, sd: jnp.ndarray):
    """The (unjitted) train-step body shared by the single-step and
    scan-over-steps entry points.

    With `hyper.flat_opt` the clip/Adam/update tail runs on ONE raveled
    parameter vector (fewer HLO ops; elementwise math position-identical,
    only the reduction order inside the global norm differs, and
    `opt_state` becomes Adam state over the flat vector). Default is the
    per-leaf tail: on TPU the ravel/unravel relinearizes every leaf's
    tiled layout each step, which measured slower (12.0 vs 9.5 ms at
    flagship scale) despite the op-count win.
    """
    from jax.flatten_util import ravel_pytree

    def step(params, opt_state, smask, batch, rng, lr_mean, lr_sigma):
        y_z = (jnp.log(jnp.maximum(batch.y, 1e-12)) - mu) / sd

        def loss_fn(p):
            loss, (mean, logvar, sample_loss) = hetero_nll(
                p, cfg, hyper, batch, y_z, rng, train=True)
            return loss, (mean, logvar, sample_loss)

        (_, (mean, logvar, sample_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if hyper.flat_opt:
            flat_g, _ = ravel_pytree(grads)
            flat_p, unravel = ravel_pytree(params)
            # trace-time constant: per-position sigma-group membership
            sigma_flat, _ = ravel_pytree(
                jax.tree.map(
                    lambda p, m: jnp.broadcast_to(jnp.asarray(m), p.shape),
                    params, smask))
            gnorm = jnp.sqrt(jnp.sum(flat_g * flat_g))
            scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
            flat_g = flat_g * scale
            if hyper.optimizer == "adam":  # coupled L2: decay enters the moments
                flat_g = flat_g + hyper.weight_decay * flat_p
                wd = 0.0
            else:                          # AdamW: decoupled decay at the update
                wd = hyper.weight_decay
            updates, opt_state = adam.update(flat_g, opt_state, flat_p)
            lr = jnp.where(sigma_flat, lr_sigma, lr_mean)
            params = unravel(flat_p - lr * (updates + wd * flat_p))
        else:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, hyper.grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
            if hyper.optimizer == "adam":
                grads = jax.tree.map(lambda g, p: g + hyper.weight_decay * p,
                                     grads, params)
                wd = 0.0
            else:
                wd = hyper.weight_decay
            updates, opt_state = adam.update(grads, opt_state, params)

            def apply_leaf(u, p, is_sigma):
                lr = jnp.where(is_sigma, lr_sigma, lr_mean)
                return p - lr * (u + wd * p)

            params = jax.tree.map(apply_leaf, updates, params,
                                  jax.tree.map(jnp.asarray, smask))

        pred = jnp.exp(mean * sd + mu)
        # y_mask is the authority on target validity (data/batching.py): an
        # invalid component's 1.0 fill must not count as a real error, and
        # n_elements counts only valid (graph, target) cells
        el_mask = batch.graph_mask[:, None] * batch.y_mask
        err = (pred - batch.y) * el_mask
        var = jnp.exp(logvar)
        metrics = StepMetrics(
            loss_sum=sample_loss.sum(),
            n_graphs=batch.graph_mask.sum(),
            abs_err_sum=jnp.abs(err).sum(),
            sq_err_sum=(err ** 2).sum(),
            n_elements=el_mask.sum(),
            logvar_sum=(logvar * el_mask).sum(),
            max_var=jnp.max(var * batch.graph_mask[:, None]),
        )
        return params, opt_state, metrics

    return step


def _key_floats(arr) -> Tuple[float, ...]:
    return tuple(float(x) for x in np.asarray(arr).ravel())


def make_train_step(cfg: AlignnConfig, hyper: TrainHyper,
                    log_means: np.ndarray, log_stds: np.ndarray):
    """Build a jitted (params, adam_state, batch, rng, lr_mean, lr_sigma) step.

    Memoized on (cfg, hyper, transform constants): sequential ensemble
    members with identical configs share one jit cache instead of
    re-tracing/re-compiling the same step per member."""
    return _cached_train_step(cfg, hyper, _key_floats(log_means),
                              _key_floats(log_stds))


@functools.lru_cache(maxsize=32)
def _cached_train_step(cfg: AlignnConfig, hyper: TrainHyper,
                       means_t: Tuple[float, ...], stds_t: Tuple[float, ...]):
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    mu = jnp.asarray(means_t, dtype=jnp.float32)
    sd = jnp.asarray(stds_t, dtype=jnp.float32)
    body = _make_step_body(cfg, hyper, adam, mu, sd)
    step = partial(jax.jit, donate_argnums=(0, 1))(body)

    def init_opt(params):
        if not hyper.flat_opt:
            return adam.init(params)
        from jax.flatten_util import ravel_pytree

        return adam.init(ravel_pytree(params)[0])

    return step, init_opt


def stack_batches(batches):
    """Stack same-budget batches into one leading-axis-K pytree for
    `make_scan_train_step` (all arenas must share capacities)."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *batches)


def make_scan_train_step(cfg: AlignnConfig, hyper: TrainHyper,
                         log_means: np.ndarray, log_stds: np.ndarray):
    """Device-side inner loop: ONE jitted program runs K optimizer steps via
    `lax.scan` over a stacked [K, ...] batch pytree.

    The TPU-idiomatic training loop: per-step host dispatch (especially
    through remote runtimes) otherwise gates the issue rate and idles the
    chip between steps. Per-step RNG keys are derived on device by folding
    the step index into `rng`; metrics come back stacked [K].
    Memoized like `make_train_step`."""
    return _cached_scan_train_step(cfg, hyper, _key_floats(log_means),
                                   _key_floats(log_stds))


@functools.lru_cache(maxsize=32)
def _cached_scan_train_step(cfg: AlignnConfig, hyper: TrainHyper,
                            means_t: Tuple[float, ...],
                            stds_t: Tuple[float, ...]):
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    mu = jnp.asarray(means_t, dtype=jnp.float32)
    sd = jnp.asarray(stds_t, dtype=jnp.float32)
    body = _make_step_body(cfg, hyper, adam, mu, sd)

    @partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(params, opt_state, smask, batches, rng, lr_mean, lr_sigma):
        n_steps = jax.tree.leaves(batches)[0].shape[0]
        keys = jax.random.split(rng, n_steps)

        def f(carry, xs):
            p, o = carry
            b, k = xs
            p, o, m = body(p, o, smask, b, k, lr_mean, lr_sigma)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(
            f, (params, opt_state), (batches, keys))
        return params, opt_state, ms

    def init_opt(params):
        if not hyper.flat_opt:
            return adam.init(params)
        from jax.flatten_util import ravel_pytree

        return adam.init(ravel_pytree(params)[0])

    return multi_step, init_opt


def reconcile_win64(cfg: AlignnConfig, budget) -> AlignnConfig:
    """Override a checkpoint config's four packer window bounds with the
    ACTIVE batch budget's bounds.

    Checkpoints embed the *training-time* bounds, but evaluate/predict plan
    a fresh budget over their own data and pack batches diluted to THAT
    budget — if eval data is denser than training data, the fused Pallas
    kernels' VMEM windows (sized from the checkpoint's bounds) under-cover
    a 64-target group's edge span and silently drop tail edges. Every
    eval/inference path that packs with a fresh budget must route its model
    config through this before building forwards. The packer's own
    dilution/deferral asserts (`epoch_batches`) then guarantee each batch
    fits the active bounds. Mirrors the reference's eval-side reconciliation
    contract (`/root/reference/scripts/evaluate.py:539-574`)."""
    # the span-formulation bounds (attn_span rung) are PACK-TIME MEASURED,
    # not budget-enforceable — a fresh budget carries no span guarantee, so
    # the rung degrades to the eproj path on eval-time repacks (same
    # numerics, different kernel boundary) instead of risking an
    # under-covered span window
    return dataclasses.replace(
        cfg,
        edge_win64=int(budget.edge_win64), lg_win64=int(budget.lg_win64),
        edge_src_win64=int(budget.edge_src_win64),
        lg_src_win64=int(budget.lg_src_win64),
        edge_span64=0, lg_span64=0)


def oneshot_config(cfg: AlignnConfig) -> AlignnConfig:
    """Config variant for one-shot evaluation/inference forwards: roll the
    layers into a lax.scan. The ~20 % slower step is dwarfed by the ~5×
    compile-time cut on the remote-compile runtime, and the two paths are
    numerically identical (test_scan_layers_matches_unrolled)."""
    if cfg.layers > 1 and not getattr(cfg, "scan_layers", False):
        return dataclasses.replace(cfg, scan_layers=True)
    return cfg


@functools.lru_cache(maxsize=64)
def make_forward(cfg: AlignnConfig, floor: float = MIN_LOGVAR_FLOOR,
                 compute_dtype: str = "float32"):
    """Jitted eval forward → (mean_z, logvar) with the floor applied.

    Memoized on (cfg, floor, compute_dtype): every caller that loops over
    ensemble members or collects multiple splits shares ONE jit cache per
    architecture — a fresh `@jax.jit` object per member used to recompile
    the identical program each time (~70 s each on the remote-compile
    runtime; evaluate spent 280 of its 315 s there).

    `compute_dtype='bfloat16'` runs the trunk in bf16 exactly as the
    training fast path does (`_cast_for_compute`; heads return f32) — the
    serving-throughput option. Default stays f32: eval numerics are the
    parity contract with the reference's fp32 inference."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def forward(params, batch):
        c_params, c_batch = _cast_for_compute(params, batch, dtype)
        mean, logvar = alignn_apply(c_params, cfg, c_batch, train=False)
        return (mean.astype(jnp.float32),
                jnp.maximum(logvar.astype(jnp.float32), floor))

    return forward


@functools.lru_cache(maxsize=64)
def make_scan_forward(cfg: AlignnConfig, floor: float = MIN_LOGVAR_FLOOR,
                      compute_dtype: str = "float32"):
    """Eval forward over a whole STACK of same-shape batches in ONE
    dispatch: `forward(params, stacked)` where every array of `stacked`
    carries a leading [S] axis (np.stack over a budget's equal-arena
    batches), scanning the per-batch program → (mean [S,G,T], logvar).

    Per-batch math is the exact `make_forward` program (lax.scan compiles
    one body; numerics identical — pinned by test_scan_collect_matches),
    but host dispatch is paid once per stack instead of once per batch: on
    the tunneled runtime a per-batch round-trip costs ~ms, which at ~10 ms
    forwards is a measurable serving tax (PERF.md round 5 serving entry)."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def forward(params, stacked):
        if dtype != jnp.float32:    # cast params ONCE, outside the scan body
            params = jax.tree.map(
                lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p,
                params)

        def body(carry, batch):
            _, c_batch = _cast_for_compute({}, batch, dtype)
            mean, logvar = alignn_apply(params, cfg, c_batch, train=False)
            return carry, (mean.astype(jnp.float32),
                           jnp.maximum(logvar.astype(jnp.float32), floor))

        _, (means, logvars) = jax.lax.scan(body, 0, stacked)
        return means, logvars

    return forward


def collect_predictions(forward, params, batches) -> Tuple[np.ndarray, np.ndarray,
                                                           np.ndarray, np.ndarray]:
    """Run forward over batches, returning per-real-graph arrays on host:
    (mean_z [N,T], sigma_z [N,T], y_linear [N,T], sample_index [N])."""
    import jax

    means, sigmas, ys, idxs = [], [], [], []
    pending = jax.device_put(batches[0]) if batches else None
    for i, b in enumerate(batches):
        cur = pending
        if i + 1 < len(batches):
            pending = jax.device_put(batches[i + 1])  # async prefetch
        mean, logvar = forward(params, cur)
        mask = np.asarray(b.graph_mask) > 0
        means.append(np.asarray(mean)[mask])
        sigmas.append(np.sqrt(np.exp(np.asarray(logvar)))[mask])
        # invalid targets (y_mask 0) surface as NaN, never as y's inert
        # 1.0 fill — callers decide per-target presence by finiteness
        yv = np.where(np.asarray(b.y_mask) > 0, np.asarray(b.y), np.nan)
        ys.append(yv[mask])
        idxs.append(np.asarray(b.sample_index)[mask])
    return (np.concatenate(means), np.concatenate(sigmas),
            np.concatenate(ys), np.concatenate(idxs))


def _batch_shape_key(batch) -> tuple:
    return tuple((tuple(a.shape), str(np.asarray(a).dtype)) for a in batch)


# (cfg, floor, compute_dtype, chunk, arena-shape key) whose scan program a
# prior collection in this process already built — lets later SMALL splits
# of the same job (e.g. evaluate's 3-batch calib split after its 10-batch
# test split) ride the compiled scan program with padding instead of
# compiling the per-batch program too (~70 s per program on the
# remote-compile runtime; padded forwards cost milliseconds)
_SCAN_PROGRAMS_BUILT: set = set()


def collect_predictions_scanned(cfg: AlignnConfig, floor: float, params,
                                batches, compute_dtype: str = "float32",
                                chunk: int = 16):
    """`collect_predictions` in chunked single-dispatch form: stack the
    budget's equal-arena batches [S, ...] and run `make_scan_forward` once
    per chunk — identical numerics, 1/S the host round-trips.

    Chunks are padded to a fixed S by repeating the last batch (padded
    outputs discarded) so exactly ONE scan program compiles regardless of
    split size — a tail-sized second compile costs more than the wasted
    forwards on this runtime. Falls back to the per-batch loop when
    batches are few (padding waste would dominate — unless this process
    already built the matching scan program) or arena shapes differ
    (mixed budgets)."""
    batches = list(batches)
    if not batches:
        return collect_predictions(
            make_forward(cfg, floor, compute_dtype), params, batches)
    key0 = _batch_shape_key(batches[0])
    prog_key = (cfg, floor, compute_dtype, chunk, key0)
    if len(batches) <= max(2, chunk // 4) \
            and prog_key not in _SCAN_PROGRAMS_BUILT:
        return collect_predictions(
            make_forward(cfg, floor, compute_dtype), params, batches)
    if any(_batch_shape_key(b) != key0 for b in batches[1:]):
        return collect_predictions(
            make_forward(cfg, floor, compute_dtype), params, batches)
    fwd = make_scan_forward(cfg, floor, compute_dtype)
    _SCAN_PROGRAMS_BUILT.add(prog_key)
    means, sigmas, ys, idxs = [], [], [], []
    for at in range(0, len(batches), chunk):
        group = batches[at:at + chunk]
        n_real = len(group)
        while len(group) < chunk:        # pad: one compiled S, ever
            group.append(group[-1])
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
        mean, logvar = fwd(params, jax.device_put(stacked))
        mean = np.asarray(mean)
        sigma = np.sqrt(np.exp(np.asarray(logvar)))
        for s in range(n_real):
            b = group[s]
            mask = np.asarray(b.graph_mask) > 0
            means.append(mean[s][mask])
            sigmas.append(sigma[s][mask])
            yv = np.where(np.asarray(b.y_mask) > 0, np.asarray(b.y), np.nan)
            ys.append(yv[mask])
            idxs.append(np.asarray(b.sample_index)[mask])
    return (np.concatenate(means), np.concatenate(sigmas),
            np.concatenate(ys), np.concatenate(idxs))
