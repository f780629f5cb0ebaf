from cerebro_tpu.models.netvlad import NetVLAD, GhostVLAD  # noqa: F401
from cerebro_tpu.models.mobilenet import (  # noqa: F401
    load_ported_params,
    ported_forward,
)
from cerebro_tpu.models.descriptor import (  # noqa: F401
    DescriptorNet,
    create_descriptor_model,
    describe_batch,
)
