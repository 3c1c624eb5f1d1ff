"""Raw matmul microbenchmark through the axon tunnel.
Usage: probe_matmul.py [tiny|big|elem]"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

mode = sys.argv[1]
rng = np.random.default_rng(0)
if mode == "big":
    a = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.float32)
    f = jax.jit(lambda a, b, s: jnp.sum((a + s) @ b))
elif mode == "tiny":
    a = jnp.asarray(rng.standard_normal((1, 5, 128, 128, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    f = jax.jit(lambda a, b, s: jnp.sum((a + s) @ b))
else:
    a = jnp.asarray(rng.standard_normal((1, 5, 128, 128, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    f = jax.jit(lambda a, b, s: jnp.sum((a + s) * b))

out = jax.block_until_ready(f(a, b, jnp.float32(0.)))
n = 10
t0 = time.perf_counter()
for i in range(n):
    out = f(a, b, jnp.float32(1e-6 * i))
jax.block_until_ready(out)
print(f"matmul[{mode}]: steady={(time.perf_counter()-t0)/n*1e3:.3f} ms")
