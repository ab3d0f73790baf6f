"""Trainers, metrics, eval loops."""
from .trainer import (MetricsLogger, TrainState, make_diffusion_train_step,
                      make_optimizer, train_diffusion)
