"""Normalization layer (reference lib/stnls/normz): softmax over the K
neighbors."""

from stnls_tpu.normz.softmax import SoftmaxNormalize
from stnls_tpu.normz.api import init, extract_config, default_pairs
init_normz = init  # reference-name alias (normz/__init__.py:10)
