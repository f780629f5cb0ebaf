from cerebro_tpu.posegraph.optimizer import (  # noqa: F401
    PoseGraph,
    initialize_worlds,
    optimize,
    poses_from_xyzyaw,
    relative_yaw_t,
    relative_yaw_t_np,
)
from cerebro_tpu.posegraph.distributed import optimize_sharded, pad_graph  # noqa: F401
