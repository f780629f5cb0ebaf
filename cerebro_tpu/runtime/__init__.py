from cerebro_tpu.runtime.pipeline import (  # noqa: F401
    CerebroPipeline,
    LoopEdge,
    StreamIngestor,
)
