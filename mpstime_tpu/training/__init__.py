from .fit import fit_mps, TrainedMPS
from .sweep import full_sweep
from .stats import loss_acc_conf, predict_class_indices

__all__ = ["fit_mps", "TrainedMPS", "full_sweep", "loss_acc_conf",
           "predict_class_indices"]
