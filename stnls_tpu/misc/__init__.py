"""Misc application modules (reference lib/stnls/misc): building blocks and
the video non-local Bayes sketch."""

from stnls_tpu.models.blocks import ResBlock, ResBlockList, ChannelAttention
from stnls_tpu.misc import vnlb
from stnls_tpu.misc import flow_patches
