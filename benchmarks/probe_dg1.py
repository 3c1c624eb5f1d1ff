"""tpu.dynamic_gather form-1 probe: out[i,j] = x[idx[i,j], j] (per-lane
selection along dim 0). Tests which heights A compile and the speed.
Usage: probe_dg1.py A"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LANES = 128
NBLK = 1024  # number of lane-blocks processed (grid)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((NBLK, A, LANES)), jnp.float32)
idx = jnp.asarray(rng.integers(0, A, (NBLK, A, LANES)), jnp.int32)


def kernel(x_ref, i_ref, o_ref):
    # per-lane gather along dim 0
    o_ref[:] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=0)[None]


@jax.jit
def run(x, idx, s):
    return pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((1, A, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK, A, LANES), jnp.float32),
    )(x + s, idx)


try:
    out = run(x, idx, jnp.float32(0.))
    got = np.asarray(out[0])
    xn = np.asarray(x[0])
    idn = np.asarray(idx[0])
    want = np.take_along_axis(xn, idn, axis=0)
    print("correct:", np.abs(got - want).max())
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        o = run(x, idx, jnp.float32(1e-6 * (i + 1)))
        _ = float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    n = NBLK * A * LANES
    print(f"dg1 A={A}: {min(ts)*1e3:.2f} ms for {n/1e6:.1f}M lane-gathers")
except Exception as e:
    print(f"A={A} FAILED:", type(e).__name__, str(e)[:200])
