from .optim import build_lr_schedule, build_optimizer, frozen_mask
from .preprocess import make_oadg_preprocess
from .runner import Checkpointer, EpochBasedRunner, get_root_logger
from .train_step import make_test_step, make_train_step, parse_losses
