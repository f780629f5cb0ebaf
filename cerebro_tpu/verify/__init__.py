from cerebro_tpu.verify.geometric import (  # noqa: F401
    VerifiedLoop,
    verify_pair,
    verify_pair_batch,
    verify_pair_depth,
)
