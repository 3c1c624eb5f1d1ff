"""Device-memory probes (reference lib/stnls/utils/gpu_mem.py:3-31
print_gpu_stats/GpuRecord) adapted to TPU via jax device memory stats."""

import jax


def _stats():
    try:
        dev = jax.devices()[0]
        return dev.memory_stats() or {}
    except Exception:
        return {}


def bytes_in_use():
    return _stats().get("bytes_in_use", 0)


def peak_bytes():
    return _stats().get("peak_bytes_in_use", 0)


def print_gpu_stats(verbose=True, name="-"):
    mem = bytes_in_use() / (1024. ** 3)
    if verbose:
        print(f"[{name}] device memory: {mem:2.3f} GB")
    return mem


def print_peak_gpu_stats(verbose=True, name="-"):
    mem = peak_bytes() / (1024. ** 3)
    if verbose:
        print(f"[{name}] peak device memory: {mem:2.3f} GB")
    return mem


def reset_peak_gpu_stats():
    # jax exposes no reset; record a baseline instead
    return peak_bytes()


class GpuRecord:
    """Named (mem, peak) snapshots (reference GpuRecord)."""

    def __init__(self, use_record=True):
        self.use_record = use_record
        self.mems = {}

    def snap(self, name):
        if not self.use_record:
            return
        self.mems[name] = (bytes_in_use() / (1024. ** 3),
                           peak_bytes() / (1024. ** 3))

    def items(self):
        return self.mems.items()

    def names(self):
        return list(self.mems.keys())

    def __getitem__(self, name):
        return self.mems[name]

    def __str__(self):
        return str(self.mems)
