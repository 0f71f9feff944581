from .defaults import (
    DefaultPredictor,
    DefaultTrainer,
    default_argument_parser,
    default_setup,
)
from .hooks import HookBase
from .launch import launch
from .project_cli import project_cli
from .train_loop import TrainState, create_train_state, make_train_step
from .trainer import SimpleTrainer, TrainerBase

__all__ = [
    "DefaultPredictor",
    "DefaultTrainer",
    "default_argument_parser",
    "default_setup",
    "HookBase",
    "launch",
    "project_cli",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "SimpleTrainer",
    "TrainerBase",
]
