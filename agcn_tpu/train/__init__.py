from agcn_tpu.train import losses, optim
from agcn_tpu.train.steps import (TrainState, make_eval_step,
                                  make_multi_train_step, make_train_step)

__all__ = ["losses", "optim", "TrainState", "make_eval_step",
           "make_multi_train_step", "make_train_step"]
