"""Property-based fuzz of the edge-sharded conv formulations.

`edge_sharded_conv` re-derives one transformer conv as rank-local partial
reductions + cross-rank collectives; the windowed fast path additionally
shifts every reduction into a per-rank row window. Both must reproduce the
single-device conv EXACTLY (same math, different reduction layout) for ANY
CSR-sorted arena — including arenas whose row counts are not tile-aligned,
mid-segment shard cuts, masked tails, and row windows smaller than the
arena. Random problems here sweep the boundary conditions the fixed
fixtures in test_parallel.py cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import (given, example, settings, strategies as st, assume,
                        HealthCheck)

from gnnep_tpu.ops.graph_attention import (init_transformer_conv,
                                           transformer_conv)
from gnnep_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _case(rng, n, avg_deg, n_shards, hidden, fe, align):
    """CSR-sorted arena whose edge count is a multiple of `align`
    (equal per-shard slices; 128-aligned slices for the windowed path)
    with a masked tail."""
    degs = rng.integers(0, 2 * avg_deg + 1, n)
    degs[-1] = 0
    dst = np.repeat(np.arange(n, dtype=np.int32), degs)
    e_real = dst.shape[0]
    e_total = -(-(e_real + 1) // align) * align
    pad = e_total - e_real
    dst = np.concatenate([dst, np.full(pad, n - 1, np.int32)])
    mask = np.concatenate([np.ones(e_real, np.float32),
                           np.zeros(pad, np.float32)])
    src = rng.integers(0, n, size=e_total, dtype=np.int32)
    x = rng.standard_normal((n, hidden)).astype(np.float32)
    ea = rng.standard_normal((e_total, fe)).astype(np.float32)
    row_ptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)
    span = int((row_ptr[1:] - row_ptr[:-1]).max(initial=1))
    return x, src, dst, ea, mask, row_ptr, span


def _row_window(rp, e_total, n_shards, n):
    """Per-rank target-row window covering every shard's slice — the same
    math as `parallel.train_step.measure_row_windows` (the designated gate:
    an under-covering window is a caller contract violation)."""
    e_loc = e_total // n_shards
    R = 128
    for r in range(n_shards):
        lo = max(int(np.searchsorted(rp, r * e_loc, side="right")) - 1, 0)
        lo = (lo // 128) * 128
        hi = max(int(np.searchsorted(rp, (r + 1) * e_loc - 1,
                                     side="right")) - 1, lo)
        R = max(R, min(((hi - lo) // 128 + 1) * 128, n))
    return R


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 10_000),
       n=st.sampled_from([24, 64, 128, 200, 256]),
       avg_deg=st.sampled_from([2, 5]),
       n_shards=st.sampled_from([2, 4, 8]),
       heads=st.sampled_from([2, 4]),
       impl=st.sampled_from(["coo", "table", "windowed"]),
       chunks=st.sampled_from([1, 3]))
# pinned fuzz find: a 2-shard windowed case whose measured row window
# exceeds one 128-row block (caught the under-covering-window hazard)
@example(seed=0, n=256, avg_deg=2, n_shards=2, heads=2, impl="windowed",
         chunks=1)
def test_sharded_conv_matches_single_device(seed, n, avg_deg, n_shards,
                                            heads, impl, chunks):
    from gnnep_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    from gnnep_tpu.parallel.edge_shard import edge_sharded_conv

    hidden, fe = 16, 8
    rng = np.random.default_rng(seed)
    align = 128 * n_shards if impl == "windowed" else n_shards
    x, src, dst, ea, mask, rp, span = _case(rng, n, avg_deg, n_shards,
                                            hidden, fe, align)
    assume((mask > 0).any())
    params = init_transformer_conv(jax.random.PRNGKey(seed % 97), hidden,
                                   hidden, edge_dim=fe)
    want = transformer_conv(params, x, src, dst, ea, heads=heads,
                            edge_mask=mask)

    mesh = make_mesh(1, n_shards, devices=jax.devices()[:n_shards])

    rw = (_row_window(rp, dst.shape[0], n_shards, n)
          if impl == "windowed" else 0)

    def device_fn(p, xx, ss, dd, aa, mm, rr):
        return edge_sharded_conv(
            p, xx, ss, dd, aa, heads=heads, axis_name="edge",
            edge_mask=mm, comm_chunks=chunks, impl=impl, row_ptr=rr,
            table_width=span + 1,
            # a measured row window < n engages the per-rank window path;
            # the conv falls back to R=n when alignment can't be preserved
            row_window=rw if rw < n else 0)

    got = jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P("edge"), P("edge"), P("edge"), P("edge"), P()),
        out_specs=P(), check=False))(params, x, src, dst, ea, mask, rp)
    np.testing.assert_allclose(np.asarray(got)[:-1], np.asarray(want)[:-1],
                               rtol=3e-4, atol=3e-5)


def test_undercovering_row_window_fails_loudly():
    """A row_window NOT derived from measure_row_windows (too small for a
    rank's row span) must poison the output with NaN — never silently drop
    the out-of-window contributions."""
    from gnnep_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    from gnnep_tpu.parallel.edge_shard import edge_sharded_conv

    hidden, fe, heads, n_shards = 16, 8, 2, 2
    rng = np.random.default_rng(0)
    n = 256
    x, src, dst, ea, mask, rp, span = _case(rng, n, 2, n_shards, hidden, fe,
                                            128 * n_shards)
    assert _row_window(rp, dst.shape[0], n_shards, n) > 128  # genuinely small
    params = init_transformer_conv(jax.random.PRNGKey(1), hidden, hidden,
                                   edge_dim=fe)
    mesh = make_mesh(1, n_shards, devices=jax.devices()[:n_shards])

    def device_fn(p, xx, ss, dd, aa, mm, rr):
        return edge_sharded_conv(
            p, xx, ss, dd, aa, heads=heads, axis_name="edge", edge_mask=mm,
            impl="windowed", row_ptr=rr, table_width=span + 1,
            row_window=128)

    got = jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P("edge"), P("edge"), P("edge"), P("edge"), P()),
        out_specs=P(), check=False))(params, x, src, dst, ea, mask, rp)
    assert not np.isfinite(np.asarray(got)).all(), \
        "under-covering row window produced finite (silently wrong?) output"
