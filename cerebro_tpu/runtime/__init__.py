from cerebro_tpu.runtime.pipeline import CerebroPipeline, LoopEdge  # noqa: F401
