"""End-to-end space-time attention with stnls_tpu (the reference's
scripts/example_attn.py flow): search_flow -> NonLocalSearch -> softmax ->
NonLocalGather -> conv projection, forward + backward.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python examples/attn_example.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu


def main():
    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    V_in = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    proj_w = jnp.asarray(rng.standard_normal((F, F)) / np.sqrt(F), jnp.float32)
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    stack_w = jnp.asarray(
        rng.standard_normal((K, F, F)) / np.sqrt(K * F), jnp.float32)

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float")
    gather = stnls_tpu.agg.NonLocalGather(ps=5, stride0=stride0,
                                      wt_hint=2 * wt)

    def attn(v_in, fflow, bflow):
        # -- qkv projections (1x1 convs == per-pixel matmuls) --
        q = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        k = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        v = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)

        # -- accumulate flows, search, normalize, aggregate --
        flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
        dists, srch_flows = search(q, k, flows)
        weights = jax.nn.softmax(-10. * dists, axis=-1)
        stack = gather(v, weights, srch_flows)  # [B,HD,K,T,F/HD,H,W]

        # -- K-mixing projection (conv3d over K with 1x1 spatial) --
        Bs, HDs, Ks, Ts, Fs, Hs, Ws = stack.shape
        stack = jnp.transpose(stack, (0, 3, 2, 1, 4, 5, 6)) \
            .reshape(Bs, Ts, Ks, HDs * Fs, Hs, Ws)
        out = jnp.einsum("btkchw,kcd->btdhw", stack, stack_w)
        return out

    loss = lambda *a: jnp.mean(attn(*a) ** 2)
    fwd = jax.jit(attn)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(V_in, fflow, bflow))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(V_in, fflow, bflow))
    t_fwd = time.perf_counter() - t0

    t0 = time.perf_counter()
    g_vid, g_flow = jax.block_until_ready(grad(V_in, fflow, bflow))
    t0b = time.perf_counter()
    g_vid, g_flow = jax.block_until_ready(grad(V_in, fflow, bflow))
    t_bwd = time.perf_counter() - t0b

    print("V_out.shape:", out.shape)
    print("grad shapes:", g_vid.shape, g_flow.shape)
    print("finite:", bool(jnp.isfinite(out).all()),
          bool(jnp.isfinite(g_vid).all()), bool(jnp.isfinite(g_flow).all()))
    print(f"compile {t_compile:.1f}s  fwd {t_fwd*1e3:.1f}ms  "
          f"fwd+bwd {t_bwd*1e3:.1f}ms  ({T/t_bwd:.1f} frames/s fwd+bwd)")


if __name__ == "__main__":
    main()
