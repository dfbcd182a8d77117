"""Training layer: losses, optimizers, the jitted train step and loop."""

from convsep_tpu.train.losses import separation_loss, interference_matrix
from convsep_tpu.train.optim import lasagne_adadelta, make_optimizer

__all__ = [
    "separation_loss",
    "interference_matrix",
    "lasagne_adadelta",
    "make_optimizer",
]
