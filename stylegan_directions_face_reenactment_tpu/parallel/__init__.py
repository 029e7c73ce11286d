"""Parallelism: device mesh, shardings, data-parallel jit (all new — the
reference is single-device, SURVEY.md §2.13)."""

from .mesh import (make_mesh, make_hybrid_mesh, distributed_init,
                   batch_sharding, replicated, shard_batch, replicate,
                   data_parallel_jit, pad_to_multiple, DATA_AXIS, DCN_AXIS)
