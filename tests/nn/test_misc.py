"""Misc application modules: vnlb denoiser improves PSNR on the DAVIS
fixture; flow_patches scores real flow better than garbage flow."""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.misc import vnlb, flow_patches
from stnls_tpu.testing import data as tdata
from stnls_tpu.utils.config import ConfigDict


def psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_vnlb_denoises():
    clean = tdata.davis_baseball(3)  # [1,3,3,64,64]
    rng = np.random.default_rng(0)
    sigma = 30.
    noisy = clean + jnp.asarray(
        rng.standard_normal(clean.shape) * sigma / 255., jnp.float32)
    cfg = {"sigma": sigma, "ws": 7, "wt": 1, "ps": 5, "k": 24,
           "stride0": 2, "nsteps": 2}
    den = vnlb.run_vnlb(cfg, noisy)
    p_in = psnr(noisy, clean)
    p_out = psnr(den, clean)
    assert p_out > p_in + 4.0, f"vnlb must denoise: {p_in:.2f} -> {p_out:.2f}"


def test_flow_patches_scores_flow():
    clean = tdata.davis_baseball(3)
    B, T, C, H, W = clean.shape
    rng = np.random.default_rng(0)
    zero = ConfigDict(fflow=jnp.zeros((B, T, 2, H, W), jnp.float32),
                      bflow=jnp.zeros((B, T, 2, H, W), jnp.float32))
    garbage = ConfigDict(
        fflow=jnp.asarray(10 * rng.standard_normal((B, T, 2, H, W)),
                          jnp.float32),
        bflow=jnp.asarray(10 * rng.standard_normal((B, T, 2, H, W)),
                          jnp.float32))
    mse_zero = flow_patches.get_mse(clean, zero, 3)
    mse_garb = flow_patches.get_mse(clean, garbage, 3)
    assert mse_zero.fflow < mse_garb.fflow
    assert mse_zero.bflow < mse_garb.bflow
