"""tpu.dynamic_gather probe: per-row gather out[i,j] = x[i, idx[i,j]]
with x/idx same shape. Table replicated across rows; grid over index
blocks. Measures whether Mosaic supports wide rows and at what speed."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_row = int(sys.argv[1]) if len(sys.argv) > 1 else 95232  # table row len
ROWS = 8
N = 36 * 409600  # 14.7M gathers total

M = 5 * 138 * 138  # 95220
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B_row,)), jnp.float32)
tab8 = jnp.broadcast_to(table, (ROWS, B_row))  # replicated rows
n_per_step = ROWS * B_row
n_steps = max(1, N // n_per_step)
idx = jnp.asarray(
    rng.integers(0, min(M, B_row), (n_steps, ROWS, B_row)), jnp.int32)


def kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[0], axis=1)[None]


@jax.jit
def run(tab8, idx, s):
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((ROWS, B_row), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, B_row), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, B_row), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, ROWS, B_row), jnp.float32),
    )(tab8 + s, idx)


try:
    out = run(tab8, idx, jnp.float32(0.))
    got = np.asarray(out[0, 0, :64])
    want = np.asarray(table)[np.asarray(idx[0, 0, :64])]
    print("correct:", np.abs(got - want).max())
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(tab8, idx, jnp.float32(1e-6 * (i + 1)))
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    tot = n_steps * n_per_step
    print(f"dynamic_gather rowlen={B_row}: {min(ts)*1e3:.2f} ms "
          f"for {tot/1e6:.1f}M gathers")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:300])
