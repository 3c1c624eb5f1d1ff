"""String-menu construction of search ops (reference
lib/stnls/search/api.py:23-56)."""

import importlib

from stnls_tpu.utils.config import extract_pairs, ConfigDict

MENU = ConfigDict({
    "exact": "non_local_search",
    "nls": "non_local_search",
    "nl": "non_local_search",
    "refine": "refinement",
    "pair": "paired_search",
    "paired": "paired_search",
    "paired_refine": "paired_refine",
    "paired_ref": "paired_refine",
    "rand_inds": "rand_inds",
    "n3mm": "n3mm_search",
})


def from_search_menu(name):
    return MENU.get(name, name)


def extract_config(_cfg, restrict=True):
    pairs = {"search_name": "nls"}
    search_name = extract_pairs(_cfg, pairs, restrict=False)["search_name"]
    pkg_name = from_search_menu(search_name)
    mod = importlib.import_module(f"stnls_tpu.search.{pkg_name}")
    cfg = mod.extract_config(_cfg)
    cfg.search_name = search_name
    return cfg


def init(cfg):
    cfg = extract_config(cfg, False)
    pkg_name = from_search_menu(cfg.search_name)
    mod = importlib.import_module(f"stnls_tpu.search.{pkg_name}")
    return mod.init(cfg)
