from nextou_tpu.train.optimizer import make_optimizer, poly_lr
from nextou_tpu.train.state import TrainState, create_train_state
from nextou_tpu.train.train_step import make_train_step, make_eval_step
from nextou_tpu.train.registry import get_trainer_class, TRAINER_REGISTRY
from nextou_tpu.train import trainers as _trainers  # noqa: F401 (registers)
from nextou_tpu.train.trainer import NexToUTrainer
