"""CPU probe: minimal viable flow/spread budgets + predication activity
density at the bench config, for several tile heights.

Usage: python -u benchmarks/probe_spread.py
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import smooth_flows  # noqa: E402
import stnls_tpu  # noqa: E402
from stnls_tpu.search.utils import shape_flows  # noqa: E402
from stnls_tpu.ops.nls_pallas import (  # noqa: E402
    _pallas_prep, pallas_geometry,
)


def main():
    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = shape_flows(HD, stnls_tpu.nn.search_flow(fflow, bflow, wt,
                                                     stride0))
    vshape = (B, HD, T, F, H, W)

    for TH in (8, 16, 32):
        for sb in [(4, 6), (6, 8), (8, 10), (10, 12), (12, 14), (14, 16)]:
            prep = _pallas_prep(
                vshape, flows, ws=ws, wt=wt, ps=ps, stride0=stride0,
                stride1=stride1, dilation=1, full_ws=True, use_adj=False,
                itype="float", flow_budget=8, spread_budget=sb,
                tile=(TH,))
            n_out = int(jnp.sum(prep["outliers"]))
            geo = prep["geo"]
            if n_out == 0:
                # activity density: fraction of (row shift, col shift)
                # slots live per tile
                m, Sp = geo["m"], geo["Sp"]
                Dloc, Dkc = geo["Dloc"], geo["Dkc"]
                l0h = prep["l0h"].reshape(prep["BH"], prep["P"],
                                          prep["nT"], -1)
                l0w = prep["l0w"].reshape(prep["BH"], prep["P"],
                                          prep["nT"], -1)
                rowact = np.stack(
                    [np.asarray(jnp.any((l0h > j - Sp) & (l0h <= j),
                                        axis=-1)) for j in range(Dloc)], -1)
                colact = np.stack(
                    [np.asarray(jnp.any((l0w > j - Sp) & (l0w <= j),
                                        axis=-1)) for j in range(Dkc)], -1)
                print(f"TH={TH} spread={sb}: ok "
                      f"ZL={geo['ZL']} ZLc={geo['ZLc']} "
                      f"sweep={geo['m']**2*geo['ZL']*geo['ZLc']} "
                      f"rowact={rowact.mean():.2f} "
                      f"colact={colact.mean():.2f}", flush=True)
                break
            print(f"TH={TH} spread={sb}: {n_out} outliers", flush=True)


if __name__ == "__main__":
    main()
