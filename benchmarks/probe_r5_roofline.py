"""Round-5 roofline probe: measure the chip's actual peaks (HBM BW, VPU
FMA, MXU fp32/bf16) and place the fused search kernel against its own
speed-of-light (VERDICT r4 next #1). All numbers within ONE process (the
axon tunnel varies ~25% between processes).

Run: python benchmarks/probe_r5_roofline.py
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.abs(x[..., :1, :1].astype(jnp.float32)))
               for x in leaves)


def timed(fn, *args, n=20, warmup=3):
    """block_until_ready does NOT sync through the axon tunnel; only
    float(scalar) does (see bench.py) — reduce to a scalar and pull it."""
    sfn = jax.jit(lambda *a: _scalarize(fn(*a)))
    for _ in range(warmup):
        float(sfn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        s = sfn(*args)
    float(s)
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())

    # ---- HBM bandwidth: big copy (read+write) ----
    x = jnp.zeros((512, 1024, 1024), jnp.float32)  # 2 GiB
    cp = jax.jit(lambda a: a + 1.0)
    t = timed(cp, x, n=10)
    bw = 2 * x.size * 4 / t / 1e9
    print(f"HBM copy: {t*1e3:.2f} ms -> {bw:.0f} GB/s (read+write)")

    # ---- MXU: bf16 and fp32 square matmuls ----
    for dt, n in ((jnp.bfloat16, 8192), (jnp.float32, 8192)):
        a = jnp.ones((n, n), dt)
        b = jnp.ones((n, n), dt)
        mm = jax.jit(lambda a, b: a @ b)
        t = timed(mm, a, b, n=10)
        fl = 2 * n**3 / t / 1e12
        print(f"MXU {np.dtype(dt).name} {n}x{n}: {t*1e3:.2f} ms -> "
              f"{fl:.1f} TFLOP/s")

    # ---- VPU: FMA chain on VMEM-resident data (pallas) ----
    NIT = 512

    def vpu_kernel(x_ref, o_ref):
        a = x_ref[...]
        b = a * 1.0001
        c = a * 0.9999

        def body(i, carry):
            b, c = carry
            b = b * a + c
            c = c * a + b
            return (b, c)

        b, c = lax.fori_loop(0, NIT, body, (b, c))
        o_ref[...] = b + c

    for dt in (jnp.float32, jnp.bfloat16):
        xshape = (512, 1024)
        xx = jnp.ones(xshape, dt)
        f = pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct(xshape, dt),
        )
        jf = jax.jit(f)
        t = timed(jf, xx, n=20)
        fl = 4 * NIT * xx.size / t / 1e12  # 2 FMA = 4 flop per elem/iter
        print(f"VPU {np.dtype(dt).name} FMA chain: {t*1e3:.3f} ms -> "
              f"{fl:.2f} TFLOP/s")

    # ---- VPU: compare/select throughput (the one-hot selection op mix)
    def sel_kernel(x_ref, l_ref, o_ref):
        a = x_ref[...]
        l0 = l_ref[...]
        acc = jnp.zeros_like(a)

        def body(i, acc):
            m = (l0 == i).astype(jnp.float32)
            return acc + m * a

        acc = lax.fori_loop(0, NIT, body, acc)
        o_ref[...] = acc

    xx = jnp.ones((512, 1024), jnp.float32)
    ll = jnp.zeros((512, 1024), jnp.float32)
    f = pl.pallas_call(
        sel_kernel,
        out_shape=jax.ShapeDtypeStruct((512, 1024), jnp.float32))
    t = timed(jax.jit(f), xx, ll, n=20)
    ops = 3 * NIT * xx.size / t / 1e12  # cmp + mul + add
    print(f"VPU cmp+FMA select chain: {t*1e3:.3f} ms -> {ops:.2f} Top/s")

    # ---- diagonal extraction cost (the MXU blocker): strided slice on
    # sublane vs lane axis ----
    A = jnp.ones((64 * 40, 256), jnp.float32)     # [H*AH, W]

    def diag_sub(a):
        # rows h*40 + (h+dh): stride 41 over flattened axis
        out = []
        for dh in range(8):
            out.append(lax.slice(a, (dh, 0), ((63 - 1) * 41 + dh + 1, 256),
                                 (41, 1)))
        return sum(out)

    t = timed(jax.jit(diag_sub), A, n=20)
    elems = 8 * 63 * 256
    print(f"sublane-strided diag extract (8 shifts of [64,256]): "
          f"{t*1e3:.3f} ms -> {t/elems*1e9:.2f} ns/elem")

    B = jnp.ones((256, 64 * 40), jnp.float32)     # [H, W*AW]

    def diag_lane(a):
        out = []
        for dw in range(8):
            out.append(lax.slice(a, (0, dw), (256, (63 - 1) * 41 + dw + 1),
                                 (1, 41)))
        return sum(out)

    t = timed(jax.jit(diag_lane), B, n=20)
    print(f"lane-strided diag extract (8 shifts of [256,63]): "
          f"{t*1e3:.3f} ms -> {t/(8*63*256)*1e9:.2f} ns/elem")

    # ---- current fused search kernel at the headline config ----
    from stnls_tpu.search import NonLocalSearch
    rng = np.random.default_rng(0)
    B_, T, F, H, W = 1, 5, 32, 128, 128
    HD, ws, wt, ps, K = 2, 5, 2, 3, 10
    vid = jnp.asarray(rng.standard_normal((B_, T, F, H, W)), jnp.float32)
    flows = jnp.asarray(np.clip(
        3.0 * rng.standard_normal((B_, T, 2 * wt, 2, H, W)), -8, 8),
        jnp.float32)
    s = NonLocalSearch(ws, wt, ps, K, nheads=HD, stride0=1, stride1=0.5,
                       self_action="anchor", itype="float", impl="pallas")
    d, i = s(vid, vid, flows)   # eager warm-up resolves budgets
    f = jax.jit(lambda v, fl: s(v, v, fl))
    t = timed(f, vid, flows, n=10)
    print(f"search fwd (headline cfg): {t*1e3:.2f} ms")

    g = jax.jit(jax.grad(lambda v, fl: jnp.sum(jnp.tanh(s(v, v, fl)[0])),
                         (0, 1)))
    t2 = timed(g, vid, flows, n=10)
    print(f"search fwd+bwd (headline cfg): {t2*1e3:.2f} ms "
          f"(bwd ~= {max(t2-t,0)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
