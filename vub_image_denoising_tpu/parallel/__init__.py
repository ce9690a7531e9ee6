from .fsdp import fsdp_shardings, put_fsdp, sharded_fraction
from .tp import make_tp_mesh, put_tp, tp_shardings
from .mesh import (
    all_processes_mean,
    init_distributed,
    make_global_batch,
    make_mesh,
    put_batch,
    put_replicated,
    replicate,
    shard_batch,
    shard_spatial,
)
from .tiles import denoise_large_image
from .pipeline import make_pp_mesh, pipeline_sample_fn, pipelined_sampling
