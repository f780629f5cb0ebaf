from cerebro_tpu.parallel.mesh import make_mesh  # noqa: F401
from cerebro_tpu.parallel.sharded_search import (  # noqa: F401
    detect_batch_sharded,
    shard_db,
    sharded_max_and_argmax,
    sharded_topk,
)
