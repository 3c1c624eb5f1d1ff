"""Discriminate winner-bits logic error vs numeric drift: run the
float/anchor grad check twice — winner-only bwd bits vs full-window bwd
bits. If errors match, the winner bits are sound and the residual is
reassociation noise.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_check2.py
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stnls_tpu.search import NonLocalSearch
import stnls_tpu.ops.nls_pallas_bwd as npb
from stnls_tpu.ops.nls_pallas import pack_joint_bits

winner_bits_orig = npb.winner_joint_bits


def full_bits(cfg, cells_pl, selfidp, l0h, l0w):
    Sp, m = cfg["Sp"], cfg["m"]
    Dloc, Dkc = m * cfg["ZL"], m * cfg["ZLc"]
    BH, P, nT, TH, TW = l0h.shape
    l0hf = l0h.reshape(BH, P, nT, -1)
    l0wf = l0w.reshape(BH, P, nT, -1)
    rowhit = ((l0hf[:, :, :, None, :] > jnp.arange(Dloc)[:, None] - Sp)
              & (l0hf[:, :, :, None, :] <= jnp.arange(Dloc)[:, None]))
    colhit = ((l0wf[:, :, :, None, :] > jnp.arange(Dkc)[:, None] - Sp)
              & (l0wf[:, :, :, None, :] <= jnp.arange(Dkc)[:, None]))
    return pack_joint_bits(rowhit, colhit, Dkc)


def grads(mode):
    npb.winner_joint_bits = winner_bits_orig if mode == "winner" \
        else full_bits
    rng = np.random.default_rng(5)
    B, T, F, H, W = 1, 3, 8, 32, 32
    HD, ws, wt, ps, K = 1, 3, 1, 3, 5
    vid0 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    flows = jnp.asarray(
        2.0 * (2 * rng.random((B, T, 2 * wt, 2, H, W)) - 1), jnp.float32)
    common = dict(nheads=HD, stride0=1, stride1=1, self_action="anchor",
                  itype="float")
    s_ref = NonLocalSearch(ws, wt, ps, K, impl="lattice", **common)
    s_pal = NonLocalSearch(ws, wt, ps, K, impl="pallas", flow_budget=4,
                           spread_budget=10, **common)

    def loss(s):
        def f(v0, v1, fl):
            d, i = s(v0, v1, fl)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) \
                + jnp.sum(i * i)
        return jax.grad(f, (0, 1, 2))(vid0, vid1, flows)

    gr = loss(s_ref)
    gp = loss(s_pal)
    out = {}
    for n, a, b in zip(("gv0", "gv1", "gfl"), gr, gp):
        a, b = np.asarray(a), np.asarray(b)
        out[n] = (float(np.max(np.abs(a - b) / (np.abs(a) + 1.0))),
                  np.asarray(b))
    return out


if __name__ == "__main__":
    w = grads("winner")
    f = grads("full")
    for n in ("gv0", "gv1", "gfl"):
        dd = np.max(np.abs(w[n][1] - f[n][1]))
        print(f"{n}: winner_err={w[n][0]:.2e} full_err={f[n][0]:.2e} "
              f"winner_vs_full={dd:.2e}")
