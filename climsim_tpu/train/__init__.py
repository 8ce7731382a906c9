from .loop import FitConfig, TrainState, fit, init_state, make_train_step, \
    make_eval_step, save_checkpoint, restore_checkpoint
from . import losses, schedules
from .soap import soap
from .muon import muon

__all__ = ["FitConfig", "TrainState", "fit", "init_state", "make_train_step",
           "make_eval_step", "save_checkpoint", "restore_checkpoint",
           "losses", "schedules", "soap", "muon"]
