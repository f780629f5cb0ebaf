from cerebro_tpu.runtime.pipeline import (  # noqa: F401
    CerebroPipeline,
    LoopEdge,
    StreamIngestor,
)
from cerebro_tpu.runtime.service import CerebroService  # noqa: F401
from cerebro_tpu.runtime.compile_cache import enable_compilation_cache  # noqa: F401
