from cerebro_tpu.kidnap.monitor import KidnapEvent, KidnapMonitor  # noqa: F401
