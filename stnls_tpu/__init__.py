"""stnls_tpu: TPU-native space-time non-local search framework.

A ground-up JAX/Pallas rebuild of the capabilities of gauenk/stnls
(Space-Time Attention with a Shifted Non-Local Search, arXiv:2309.16849):
flow-guided space-time attention built from a differentiable non-local
search, softmax normalization, and non-local aggregation, designed for TPU
(XLA fusion, Pallas kernels, jax.sharding distribution) rather than
translated from CUDA.
"""

__version__ = "0.1.0"

from stnls_tpu import ops
from stnls_tpu import search
from stnls_tpu import agg
from stnls_tpu import nn
from stnls_tpu import normz
from stnls_tpu import graph_opts
from stnls_tpu import utils
from stnls_tpu import testing
from stnls_tpu import flow
from stnls_tpu import parallel
from stnls_tpu import models
from stnls_tpu import misc
