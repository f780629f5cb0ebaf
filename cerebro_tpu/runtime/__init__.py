from cerebro_tpu.runtime.pipeline import (  # noqa: F401
    CerebroPipeline,
    LoopEdge,
    StreamIngestor,
)
from cerebro_tpu.runtime.service import CerebroService  # noqa: F401
