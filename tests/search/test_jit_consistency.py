"""jit-vs-eager consistency regression tests.

The axon/TPU XLA stack was observed miscompiling concatenate(axis=a)
followed by a slice on axis b != a (both flow components read component 0,
silently corrupting every flow-shifted search slot). The search core now
slices before padding; these tests pin jit == eager on the active backend.
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls import nls_search_volume


def test_volume_jit_matches_eager():
    rng = np.random.default_rng(0)
    vid0 = jnp.asarray(rng.standard_normal((1, 1, 3, 2, 8, 8)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((1, 1, 3, 2, 8, 8)), jnp.float32)
    flows = jnp.asarray(rng.standard_normal((1, 1, 3, 2, 2, 8, 8)),
                        jnp.float32)
    kw = dict(ws=3, wt=1, ps=1, stride0=1, stride1=1, dist_type="l2",
              itype="float")

    def f(v0, v1, fl):
        return nls_search_volume(v0, v1, fl, **kw)

    d_e, i_e = f(vid0, vid1, flows)
    d_j, i_j = jax.jit(f)(vid0, vid1, flows)
    np.testing.assert_allclose(np.asarray(d_e), np.asarray(d_j), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_e), np.asarray(i_j), atol=1e-5)
    # the H/W components must genuinely differ (catches component aliasing)
    assert not np.allclose(np.asarray(i_j[1]), np.asarray(i_j[2]))
