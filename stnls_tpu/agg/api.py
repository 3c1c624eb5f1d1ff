"""String-menu construction of aggregation ops (reference
lib/stnls/agg/api.py:20-48).

Note: the reference's default "wpsum" menu entry points at a module that no
longer exists in its tree (stnls/agg/wpsum.py was moved to legacy dev/);
here "wpsum" resolves to the live equivalent, PooledPatchSum (pool).
"""

import importlib

from stnls_tpu.utils.config import extract_pairs, ConfigDict

MENU = ConfigDict({
    "wpsum": "pool",
    "pool": "pool",
    "nlstack": "gather",
    "nlgather": "gather",
    "gather": "gather",
    "gather_add": "gather_add",
    "scatter": "scatter",
    "scatter_sum": "scatter_add",
    "scatter_add": "scatter_add",
    "stack_conv": "stack_conv",
})


def from_agg_menu(name):
    return MENU.get(name, name)


def extract_config(_cfg, restrict=True):
    pairs = {"agg_name": "wpsum"}
    agg_name = extract_pairs(_cfg, pairs, restrict=False)["agg_name"]
    pkg_name = from_agg_menu(agg_name)
    mod = importlib.import_module(f"stnls_tpu.agg.{pkg_name}")
    cfg = mod.extract_config(_cfg)
    cfg.agg_name = agg_name
    return cfg


def init(cfg):
    cfg = extract_config(cfg)
    pkg_name = from_agg_menu(cfg.agg_name)
    mod = importlib.import_module(f"stnls_tpu.agg.{pkg_name}")
    return mod.init(cfg)
