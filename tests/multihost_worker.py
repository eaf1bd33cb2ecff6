"""Worker for the 2-process jax.distributed localhost test.

Spawned by tests/test_multihost.py with argv = (coordinator_port,
process_id). Each process brings 4 virtual CPU devices, so the global mesh
is 8 devices over 2 hosts: init_distributed + make_multihost_mesh(n_edge=2)
→ Mesh(4×2) with the edge axis inside each process's local (ICI-analogue)
domain. The worker then runs one jitted global computation over the mesh
(psum-style reduction of a process-sharded array), one graph-aligned
training step, one general edge-sharded (all-reduce) step, and one
boundary-exchange step with a nonzero cut — so the per-conv boundary kv
all_to_all crosses the process boundary — proving every multi-host code
path compiles and executes, not just that the helpers import.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gnnep_tpu.parallel.mesh import init_distributed, make_multihost_mesh

    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)  # idempotent
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 8

    mesh = make_multihost_mesh(n_edge=2)
    assert mesh.devices.shape == (4, 2), mesh.devices.shape

    # one global all-device reduction over the mesh: each device contributes
    # its (data_rank + edge_rank); the replicated sum must match on all hosts
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data", "edge"))
    grid = np.arange(8, dtype=np.float32).reshape(4, 2)
    arr = jax.make_array_from_callback(
        (4, 2), sharding, lambda idx: grid[idx])
    total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr))
    assert total == float(grid.sum()), total

    # one graph-aligned training step across both processes: every global
    # device slot consumes one sub-batch (process-local data), the gradient
    # psum crosses the process (DCN-analogue) boundary
    from gnnep_tpu.data.batching import equalize_batches
    from gnnep_tpu.models.alignn import AlignnConfig, init_alignn
    from gnnep_tpu.parallel.train_step import (aligned_pspecs,
                                               make_aligned_train_step,
                                               stack_for_mesh)
    from gnnep_tpu.train.loop import TrainHyper, sigma_mask
    from gnnep_tpu.utils.synth import synthetic_batch

    cfg = AlignnConfig(node_dim=8, edge_dim=6, angle_dim=5, global_dim=289,
                       target_dim=2, hidden=16, layers=1, heads=2, dropout=0.0)
    hyper = TrainHyper(feature_jitter_std=0.0)
    params = init_alignn(jax.random.PRNGKey(0), cfg)
    smask = sigma_mask(params)
    rng = np.random.default_rng(0)  # same stream on both hosts
    subs = equalize_batches([
        synthetic_batch(rng, n_graphs=2, mean_atoms=4, degree=3, node_dim=8,
                        edge_dim=6, angle_dim=5, global_dim=59,
                        table_cap=16, lg_table_cap=16) for _ in range(8)])
    step, init_opt = make_aligned_train_step(
        mesh, cfg, hyper, np.array([4.32, 3.56]), np.array([0.91, 0.94]))
    host_stacked = stack_for_mesh(subs, 8)
    # globalize the host-stacked super-batch: both processes hold the full
    # (identical) array, so each just donates its addressable shards
    def globalize(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    specs = aligned_pspecs()
    stacked = jax.tree.map(globalize, host_stacked, specs)
    params, _, loss, n = step(params, init_opt(params), stacked,
                              jax.random.PRNGKey(1), 3e-4, 3e-4, smask)
    # outputs are replicated; read this process's addressable replica
    loss = float(np.asarray(loss.addressable_data(0)))
    n = float(np.asarray(n.addressable_data(0)))
    assert np.isfinite(loss), loss
    assert n == sum(float(np.asarray(b.graph_mask).sum()) for b in subs), n

    # one general edge-sharded step (windowed fast path with measured
    # widths + per-rank row windows) across the same 2-process mesh: the
    # per-conv pmax/psum combines cross the process boundary
    from gnnep_tpu.parallel.train_step import (batch_pspecs,
                                               make_sharded_train_step,
                                               measure_row_windows,
                                               measure_table_widths)

    es_batches = equalize_batches([
        synthetic_batch(rng, n_graphs=2, mean_atoms=4, degree=3, node_dim=8,
                        edge_dim=6, angle_dim=5, global_dim=59,
                        table_cap=16, lg_table_cap=16) for _ in range(4)])
    es_step, es_init = make_sharded_train_step(
        mesh, cfg, hyper, np.array([4.32, 3.56]), np.array([0.91, 0.94]),
        table_widths=measure_table_widths(es_batches),
        row_windows=measure_row_windows(es_batches, 2))
    es_stacked = jax.tree.map(globalize, stack_for_mesh(es_batches, 4),
                              batch_pspecs())
    params2 = init_alignn(jax.random.PRNGKey(3), cfg)
    _, _, es_loss, es_n = es_step(params2, es_init(params2), es_stacked,
                                  jax.random.PRNGKey(2), 3e-4, 3e-4, smask)
    es_loss = float(np.asarray(es_loss.addressable_data(0)))
    es_n = float(np.asarray(es_n.addressable_data(0)))
    assert np.isfinite(es_loss), es_loss
    assert es_n == sum(float(np.asarray(b.graph_mask).sum())
                       for b in es_batches), es_n

    # one boundary-exchange step (fused-table path) across the mesh: the
    # per-conv boundary kv all_to_all crosses the process boundary — a
    # nonzero cut is forced by using graphs larger than a rank row window
    from gnnep_tpu.parallel.boundary_shard import (build_boundary_tables,
                                                   plan_boundary_batches)
    from gnnep_tpu.parallel.train_step import (boundary_pspecs,
                                               boundary_table_pspecs,
                                               make_boundary_train_step,
                                               stack_boundary_for_mesh,
                                               stack_boundary_tables)
    import dataclasses

    bd_batches = equalize_batches([
        synthetic_batch(rng, n_graphs=2, mean_atoms=30, degree=5, node_dim=8,
                        edge_dim=6, angle_dim=5, global_dim=59,
                        table_cap=16, lg_table_cap=24) for _ in range(4)])
    pbs, bplan = plan_boundary_batches(bd_batches, 2)
    assert bplan.bn > 0, "expected a nonzero boundary cut"
    btables, bmeta = build_boundary_tables(pbs, bplan)
    bcfg = dataclasses.replace(cfg, conv_impl="table")
    b_step, b_init = make_boundary_train_step(
        mesh, bcfg, hyper, np.array([4.32, 3.56]), np.array([0.91, 0.94]),
        bplan, meta=bmeta)
    b_stacked = jax.tree.map(globalize, stack_boundary_for_mesh(pbs, 4),
                             boundary_pspecs())
    b_tb = jax.tree.map(globalize, stack_boundary_tables(btables),
                        boundary_table_pspecs())
    params3 = init_alignn(jax.random.PRNGKey(5), cfg)
    _, _, b_loss, b_n = b_step(params3, b_init(params3), b_stacked, b_tb,
                               jax.random.PRNGKey(4), 3e-4, 3e-4, smask)
    b_loss = float(np.asarray(b_loss.addressable_data(0)))
    b_n = float(np.asarray(b_n.addressable_data(0)))
    assert np.isfinite(b_loss), b_loss
    assert b_n == sum(float(np.asarray(b.graph_mask).sum())
                      for b in pbs), b_n

    print(f"MULTIHOST OK pid={pid} loss={loss:.4f} graphs={int(n)} "
          f"edge_sharded_loss={es_loss:.4f} graphs={int(es_n)} "
          f"boundary_loss={b_loss:.4f} bn={bplan.bn}",
          flush=True)


if __name__ == "__main__":
    main()
