from cerebro_tpu.parallel.mesh import make_mesh  # noqa: F401
from cerebro_tpu.parallel.sharded_search import (  # noqa: F401
    detect_batch_quantized_sharded,
    detect_batch_sharded,
    shard_db,
    shard_db_quantized,
    sharded_max_and_argmax,
    sharded_max_and_argmax_int8,
    sharded_topk,
)
