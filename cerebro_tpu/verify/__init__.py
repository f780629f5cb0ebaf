from cerebro_tpu.verify.geometric import VerifiedLoop, verify_pair  # noqa: F401
