from cerebro_tpu.geometry import se3  # noqa: F401
from cerebro_tpu.geometry import cameras  # noqa: F401
