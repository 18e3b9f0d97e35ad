from convdr_tpu.train.losses import (  # noqa: F401
    kd_mse_loss,
    ranking_nll_loss,
    in_batch_nll_loss,
    in_batch_nll_multichunk_loss,
)
from convdr_tpu.train.optimizer import make_optimizer  # noqa: F401
from convdr_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
