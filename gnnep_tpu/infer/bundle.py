"""AOT serving bundles: pre-compiled, self-contained inference artifacts.

`export_bundle` serializes the ensemble's eval forward with `jax.export`
(StableHLO specialized to ONE batch-arena shape + the member checkpoints +
the scaler state + a `meta.json` packing contract) into a directory that
`ServingBundle.load` serves from without tracing or re-building the model:
deserialization rehydrates the compiled-ready program, so serving startup
skips the jit/compile path entirely and the deployed program is a pinned,
auditable artifact rather than whatever the installed model code traces to.

No reference analogue (`/root/reference/scripts/predict.py:88-224` rebuilds
torch modules from state dicts on every run) — this is the TPU-native
deployment format the serving fast path (PERF.md round 5) feeds into.
Numerics: the exported program is the exact `make_forward` program
(bit-equal on the export platform, pinned by `tests/test_bundle.py`).

Constraints inherent to AOT export: the bundle is specialized to the
export-time platform (cpu/tpu) and batch arenas — graphs exceeding the
recorded `BatchBudget` are a packer error at serving time (re-export with
a larger budget, or serve them through `Ensemble.predict --giant-shards`).
"""
from __future__ import annotations

import dataclasses
import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Sequence

import numpy as np

from ..data.batching import BatchBudget, GraphBatch, epoch_batches
from ..data.store import GraphStore
from ..train.loop import MIN_LOGVAR_FLOOR
from .predict import Ensemble, format_mixture_results

_REGISTERED = False


def _register_serializations() -> None:
    """Idempotently register the pytree node types crossing the export
    boundary (jax.export refuses unregistered NamedTuples)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from ..ops.graph_attention import TransformerConvParams

    for cls, name in ((TransformerConvParams,
                       "gnnep_tpu.TransformerConvParams"),
                      (GraphBatch, "gnnep_tpu.GraphBatch")):
        try:
            jexport.register_namedtuple_serialization(cls,
                                                      serialized_name=name)
        except ValueError:
            pass  # already registered in this process
    _REGISTERED = True


def export_bundle(ensemble_dir: str | Path, store: GraphStore,
                  out_dir: str | Path, batch_size: int = 64,
                  compute_dtype: str = "float32",
                  min_logvar_floor: float = MIN_LOGVAR_FLOOR) -> Dict:
    """Export `ensemble_dir` as a self-contained serving bundle at `out_dir`.

    `store` (raw, unstandardized) supplies the arena statistics the program
    is specialized to: the budget covers every graph in it, and becomes the
    bundle's packing contract for future inputs. Members sharing an
    architecture share one exported program. Returns the meta dict."""
    import jax
    from jax import export as jexport

    from ..train.loop import make_forward, oneshot_config, reconcile_win64

    _register_serializations()
    ens = Ensemble.load(ensemble_dir)
    std_store = ens.scaler.apply(store)
    budget = BatchBudget.plan(std_store, range(std_store.n_graphs),
                              min(batch_size, std_store.n_graphs))
    example = epoch_batches(std_store, list(range(min(std_store.n_graphs,
                                                      batch_size))),
                            budget, shuffle=False)[0]

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    programs: Dict[Any, int] = {}
    member_programs: List[int] = []
    for params, cfg in zip(ens.members, ens.cfgs):
        rcfg = oneshot_config(reconcile_win64(cfg, budget))
        if rcfg not in programs:
            fwd = make_forward(rcfg, min_logvar_floor, compute_dtype)
            exported = jexport.export(fwd)(params, example)
            k = len(programs)
            (out / f"forward_{k}.bin").write_bytes(exported.serialize())
            programs[rcfg] = k
        member_programs.append(programs[rcfg])

    src = Path(ensemble_dir)
    for f in sorted(src.iterdir()):
        if f.name.startswith("model_") and f.suffix == ".npz" \
                or f.name in ("scaler_state.npz", "conformal.json"):
            shutil.copy2(f, out / f.name)

    meta = {
        "format_version": 1,
        "budget": dataclasses.asdict(budget),
        "batch_size": int(min(batch_size, std_store.n_graphs)),
        "compute_dtype": compute_dtype,
        "min_logvar_floor": float(min_logvar_floor),
        "member_programs": member_programs,
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    return meta


class ServingBundle:
    """A loaded bundle: rehydrated programs + members + packing contract."""

    def __init__(self, ensemble: Ensemble, programs: List, meta: Dict):
        self.ensemble = ensemble
        self.programs = programs
        self.meta = meta
        self.budget = BatchBudget(**meta["budget"])

    @classmethod
    def load(cls, bundle_dir: str | Path) -> "ServingBundle":
        from jax import export as jexport

        _register_serializations()
        d = Path(bundle_dir)
        meta = json.loads((d / "meta.json").read_text())
        ensemble = Ensemble.load(d)
        programs = []
        for k in range(max(meta["member_programs"]) + 1):
            programs.append(jexport.deserialize(
                (d / f"forward_{k}.bin").read_bytes()))
        return cls(ensemble, programs, meta)

    def predict(self, store: GraphStore,
                indices: Sequence[int]) -> List[Dict[str, Any]]:
        """Mixture predictions via the pre-compiled programs. `store` is an
        already-standardized store (mirror of `Ensemble.predict`); inputs
        must fit the bundle's recorded budget (packer-checked)."""
        import jax

        if self.meta["platform"] != jax.default_backend():
            raise RuntimeError(
                f"bundle was exported for platform "
                f"'{self.meta['platform']}' but this process runs "
                f"'{jax.default_backend()}' — re-export on the target "
                "platform")
        idx = [int(i) for i in indices]
        batches = epoch_batches(store, idx, self.budget, shuffle=False)
        member_means, member_vars = [], []
        order = ys = None
        for params, prog_k in zip(self.ensemble.members,
                                  self.meta["member_programs"]):
            call = self.programs[prog_k].call
            rows_m, rows_s, rows_y, rows_i = [], [], [], []
            for b in batches:
                mean, logvar = call(params, jax.device_put(b))
                mask = np.asarray(b.graph_mask) > 0
                rows_m.append(np.asarray(mean)[mask])
                rows_s.append(np.sqrt(np.exp(np.asarray(logvar)))[mask])
                yv = np.where(np.asarray(b.y_mask) > 0,
                              np.asarray(b.y), np.nan)
                rows_y.append(yv[mask])
                rows_i.append(np.asarray(b.sample_index)[mask])
            member_means.append(np.concatenate(rows_m))
            member_vars.append(np.concatenate(rows_s) ** 2)
            order, ys = np.concatenate(rows_i), np.concatenate(rows_y)
        return format_mixture_results(member_means, member_vars, order, ys,
                                      self.ensemble.transformer, store)
