from cerebro_tpu.io.state import load_pipeline_state, save_pipeline_state  # noqa: F401
