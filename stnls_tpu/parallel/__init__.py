"""Distribution layer: jax.sharding meshes + SPMD wrappers.

The reference is a single-process, single-GPU kernel library (SURVEY §2.8:
no torch.distributed/NCCL anywhere); its only parallelism is the CUDA
launch grid. This package supplies the TPU-native scaling axes:

  * data/head sharding — (B, HD) are embarrassingly parallel
    (the CUDA grid's blockIdx.y/z axes become mesh axes);
  * temporal context parallelism — shard the frame axis T and ppermute a
    2*wt-frame halo around the ring (the reference's frame-pair streaming
    `paired_vids` mapped onto devices, SURVEY §5.7);
  * gradient reduction happens implicitly through jax.grad of the
    shard_map'd program (psum of the halo contributions).
"""

from stnls_tpu.parallel.mesh import make_mesh, data_head_specs
from stnls_tpu.parallel.shard import (
    shard_search, TimeShardedSearch, time_sharded_search, halo_gather,
)
