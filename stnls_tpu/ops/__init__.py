"""Pure-jnp / Pallas compute cores shared by the public API layers."""

from stnls_tpu.ops import geometry
from stnls_tpu.ops import nls
from stnls_tpu.ops import topk
from stnls_tpu.ops import anchor
