"""Index/gradient checking helpers (reference lib/stnls/testing/__init__.py
find_duplicate_inds:?, check_shuffled_inds:20-35, gradcheck.py)."""

import numpy as np
import jax
import jax.numpy as jnp


def find_duplicate_inds(inds):
    """inds [..., K, D]: per-entry bool mask of duplicated rows plus a
    global any-flag."""
    arr = np.asarray(inds)
    flat = arr.reshape(-1, arr.shape[-2], arr.shape[-1])
    dups = np.zeros(flat.shape[:2], bool)
    for i in range(flat.shape[0]):
        seen = {}
        for k in range(flat.shape[1]):
            key = tuple(np.round(flat[i, k], 5))
            if key in seen:
                dups[i, k] = True
            else:
                seen[key] = k
    dups = dups.reshape(arr.shape[:-1])
    return dups, bool(dups.any())


def check_shuffled_inds(inds0, inds1, atol=1e-4):
    """True if inds1 is a per-query permutation of inds0."""
    a = np.asarray(inds0, np.float64)
    b = np.asarray(inds1, np.float64)
    if a.shape != b.shape:
        return False
    a2 = a.reshape(-1, a.shape[-2], a.shape[-1])
    b2 = b.reshape(-1, b.shape[-2], b.shape[-1])
    for i in range(a2.shape[0]):
        sa = a2[i][np.lexsort(a2[i].T)]
        sb = b2[i][np.lexsort(b2[i].T)]
        if not np.allclose(sa, sb, atol=atol):
            return False
    return True


def gradcheck(fn, args, argnums=0, eps=1e-3, rtol=5e-2, atol=1e-2,
              n_checks=8, seed=0):
    """Numeric-Jacobian spot check of jax.grad(fn) (role of the
    reference's torch.autograd.gradcheck wrappers). fn must return a
    scalar. Returns True or raises."""
    if isinstance(argnums, int):
        argnums = (argnums,)
    grads = jax.grad(fn, argnums=argnums)(*args)
    rng = np.random.default_rng(seed)
    for gi, an in enumerate(argnums):
        x = args[an]
        g = grads[gi]
        for _ in range(n_checks):
            idx = tuple(int(rng.integers(0, s)) for s in x.shape)
            e = jnp.zeros_like(x).at[idx].set(eps)
            args_p = list(args)
            args_m = list(args)
            args_p[an] = x + e
            args_m[an] = x - e
            fd = (fn(*args_p) - fn(*args_m)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd),
                                       rtol=rtol, atol=atol)
    return True
