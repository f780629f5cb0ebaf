from cerebro_tpu.loop.detector import DetectorState, detect_batch, init_state  # noqa: F401
