"""Test fixture loading (reference lib/stnls/testing/data.py:14-40):
the 5-frame DAVIS baseball 64x64 clip at data/davis_baseball_64x64/."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

MAX_FRAMES = 85
_REPO_ROOT = Path(__file__).resolve().parents[2]


def load_burst(root, name, nframes=-1, ext="jpg"):
    from PIL import Image
    path = Path(root) / name
    assert path.exists(), f"missing burst dir {path}"
    burst = []
    nframes = nframes if nframes > 0 else MAX_FRAMES
    for t in range(nframes):
        fn = None
        for e in (ext, "png", "jpg"):
            cand = path / f"{t:05d}.{e}"
            if cand.exists():
                fn = cand
                break
        if fn is None:
            break
        img = Image.open(str(fn)).convert("RGB")
        burst.append(np.array(img).transpose(2, 0, 1))
    return np.ascontiguousarray(np.stack(burst).astype(np.float32))


def load_burst_batch(root, names, nframes=-1, ext="jpg"):
    vids = [jnp.asarray(load_burst(root, n, nframes, ext)) for n in names]
    return jnp.stack(vids)


def davis_baseball(nframes=-1):
    """The repo's bundled fixture clip, scaled to [0,1]: [1,T,3,64,64]."""
    vid = load_burst_batch(_REPO_ROOT / "data", ["davis_baseball_64x64"],
                           nframes)
    return vid / 255.0
