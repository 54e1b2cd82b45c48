from .optim import DualOptimizer, DualOptState
from .losses import (masked_cross_entropy, micro_f1, assortative_bce,
                     consistency_loss)
from .pipelines import make_train_step, StepMetrics

__all__ = ["DualOptimizer", "DualOptState", "masked_cross_entropy",
           "micro_f1", "assortative_bce", "consistency_loss",
           "make_train_step", "StepMetrics"]
