"""Can a Pallas TPU kernel gather from a VMEM-resident table fast?

Table: one padded frame set (5x138x138 = 95220 floats, 380KB) in VMEM.
Indices: 15M flat int32. Grid over index blocks; each block does
jnp.take / dynamic gather against the table inside the kernel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 5 * 138 * 138
N = 36 * 409600  # 14.7M
BLK = 512 * 128  # indices per grid step

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((M,)), jnp.float32)
idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)

# pad table to tile multiple
Mp = ((M + 1023) // 1024) * 1024
table_p = jnp.pad(table, (0, Mp - M))


def kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], mode="clip")


@jax.jit
def pallas_gather(tab, idx, s):
    n_blocks = N // BLK
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((Mp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
    )(tab + s, idx)


try:
    out = pallas_gather(table_p, idx, jnp.float32(0.))
    chk = float(jnp.sum(out))
    ref = float(jnp.sum(jnp.take(table_p, idx, mode="clip")))
    print(f"correct: {abs(chk-ref)/abs(ref):.2e}")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = pallas_gather(table_p, idx, jnp.float32(1e-6 * (i + 1)))
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    print(f"pallas vmem gather ({N/1e6:.0f}M): {min(ts)*1e3:.2f} ms")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500])
