from tehmm_tpu.parallel.chunking import (
    Chunk,
    ChunkBatch,
    plan_chunks,
    batch_chunks,
)
from tehmm_tpu.parallel.stitch import viterbi_chunked
from tehmm_tpu.parallel.mesh import make_data_mesh, device_count
from tehmm_tpu.parallel.em_sharded import sharded_em_stats, sharded_em_step

__all__ = [
    "Chunk",
    "ChunkBatch",
    "plan_chunks",
    "batch_chunks",
    "viterbi_chunked",
    "make_data_mesh",
    "device_count",
    "sharded_em_stats",
    "sharded_em_step",
]
