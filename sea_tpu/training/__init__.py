"""Training harness: KD distillation, optimizers, trainers."""

from .distill import SeaOptKD
from .optimizer import make_optimizer, param_labels

__all__ = ["SeaOptKD", "make_optimizer", "param_labels"]
