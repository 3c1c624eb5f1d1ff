"""Bisect the bench attention pipeline on TPU. One stage per process.
Usage: probe_attn.py [search|softmax|gather|full]"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu

stage = sys.argv[1] if len(sys.argv) > 1 else "full"
noproj = len(sys.argv) > 2 and sys.argv[2] == "noproj"
barrier = len(sys.argv) > 2 and sys.argv[2] == "barrier"
B, T = 1, 5
F, H, W = 16, 128, 128
ws, wt = 5, 2
ps, K, HD = 3, 10, 2
stride0, stride1 = 1, 0.5

rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
proj_w = jnp.asarray(rng.standard_normal((F, F)) / 4., jnp.float32)
stack_w = jnp.asarray(rng.standard_normal((K, F, F)) / 8., jnp.float32)
fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)

search = stnls_tpu.search.NonLocalSearch(
    ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
    self_action="anchor", itype="float")
gather = stnls_tpu.agg.NonLocalGather(ps=ps, stride0=stride0)


def attn(v_in, fflow, bflow, s):
    v_in = v_in + s
    if sys.argv[2:3] == ["mul"]:
        q = k = v = v_in * 2.
    elif sys.argv[2:3] == ["mul3"]:
        q, k, v = v_in * 2., v_in * 3., v_in * 4.
    elif noproj:
        q = k = v = v_in
    else:
        q = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        k = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        v = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
    if barrier:
        q, k, v = jax.lax.optimization_barrier((q, k, v))
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
    dists, srch_flows = search(q, k, flows)
    if stage == "search":
        return dists, srch_flows
    weights = jax.nn.softmax(-10. * dists, axis=-1)
    if stage == "softmax":
        return weights, srch_flows
    stack = gather(v, weights, srch_flows)
    if stage == "gather":
        return stack
    Bs, HDs, Ks, Ts, Fs, Hs, Ws = stack.shape
    stack = jnp.transpose(stack, (0, 3, 2, 1, 4, 5, 6)) \
        .reshape(Bs, Ts, Ks, HDs * Fs, Hs, Ws)
    return jnp.einsum("btkchw,kcd->btdhw", stack, stack_w)


fn = jax.jit(attn)
t0 = time.perf_counter()
out = jax.block_until_ready(fn(vid, fflow, bflow, jnp.float32(0.)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 5
t0 = time.perf_counter()
for i in range(n):
    out = fn(vid, fflow, bflow, jnp.float32(1e-6 * i))
jax.block_until_ready(out)
print(f"attn[{stage}] fwd: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")
