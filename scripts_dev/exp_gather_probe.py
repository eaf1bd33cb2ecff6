"""Dev probe: does Mosaic's tpu.dynamic_gather (take_along_axis, axis=0)
compile and run correctly on this chip, for f32 and bf16, at window shapes?

If yes, the LG conv's kv edge-space materialization can be replaced by
in-kernel row gathers from contiguous node-table spans.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, tab_ref, out_ref):
    idx = idx_ref[:]                      # [S] int32 local row ids
    tab = tab_ref[:]                      # [S, W]
    idx2 = jnp.broadcast_to(idx[:, None], tab.shape)
    out_ref[:] = jnp.take_along_axis(tab, idx2, axis=0)


def run(S, W, dtype):
    rng = np.random.default_rng(0)
    tab = rng.normal(size=(S, W)).astype(dtype)
    idx = rng.integers(0, S, size=(S,)).astype(np.int32)

    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((S, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = np.asarray(jax.jit(fn)(jnp.asarray(idx), jnp.asarray(tab)))
    except Exception as e:  # noqa: BLE001
        print(f"S={S} W={W} {np.dtype(dtype).name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")
        return False
    ref = tab[idx]
    ok = np.array_equal(out, ref)
    print(f"S={S} W={W} {np.dtype(dtype).name}: "
          f"{'OK' if ok else 'WRONG RESULTS'}")
    return ok


def bench(S, W, dtype, iters=200):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(S, W)).astype(dtype))
    idx = jnp.asarray(rng.integers(0, S, size=(S,)).astype(np.int32))
    fn = jax.jit(pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((S, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    out = fn(idx, tab)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(idx, tab)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e6
    print(f"  bench S={S} W={W} {np.dtype(dtype).name}: {dt:.1f} us/call "
          f"({S * W * np.dtype(dtype).itemsize / dt / 1e3:.0f} GB/s out)")


if __name__ == "__main__":
    ok = True
    for dt in (np.float32, np.int32, jnp.bfloat16):
        for (s, w) in ((256, 512), (640, 512), (768, 512)):
            ok &= run(s, w, dt)
    if ok:
        bench(640, 512, np.float32)
        bench(640, 512, jnp.bfloat16)
