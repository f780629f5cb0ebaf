from cerebro_tpu.db.descriptors import DescriptorDB  # noqa: F401
from cerebro_tpu.db.keyframes import KeyframeStore  # noqa: F401
