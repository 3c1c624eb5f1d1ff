"""Model-level building blocks (reference lib/stnls/misc res/chnl_attn plus
a flagship non-local denoiser wiring the full attention stack)."""

from stnls_tpu.models.blocks import ResBlock, ResBlockList, ChannelAttention
from stnls_tpu.models.denoiser import NonLocalDenoiser
