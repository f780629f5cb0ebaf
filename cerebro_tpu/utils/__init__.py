from cerebro_tpu.utils.timing import StageTimer  # noqa: F401
