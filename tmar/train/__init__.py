from tmar.train.config import TrainConfig, load_config
from tmar.train.steps import GANTrainState, make_train_step, make_eval_step, create_train_state
from tmar.train.trainer import Trainer
from tmar.train.finetune import FinetuneWeights, FinetuneState, create_finetune_state, make_finetune_step, finetune
from tmar.train.variants import VARIANTS, ABLATIONS, resolve_variant

__all__ = [
    "TrainConfig",
    "load_config",
    "GANTrainState",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
    "Trainer",
    "VARIANTS",
    "ABLATIONS",
    "resolve_variant",
    "FinetuneWeights",
    "FinetuneState",
    "create_finetune_state",
    "make_finetune_step",
    "finetune",
]
