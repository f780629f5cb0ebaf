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
from cerebro_tpu.models.wpca import (  # noqa: F401
    WPCAParams,
    apply_wpca,
    fit_wpca,
    load_wpca,
    save_wpca,
    whitened_describe_fn,
)
