from cerebro_tpu.train.loss import allpair_loss  # noqa: F401
from cerebro_tpu.train.trainer import TrainState, create_train_state, train_step  # noqa: F401
