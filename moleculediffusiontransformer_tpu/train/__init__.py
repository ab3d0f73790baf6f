"""Trainers, metrics, eval loops."""
from .trainer import (MetricsLogger, TrainState, make_diffusion_train_step,
                      make_optimizer, train_diffusion)
from .eval import (eval_forward_diffusion, eval_forward_transformer,
                   eval_inverse_diffusion, eval_inverse_transformer)
from . import profiling, recipes
from .trainer import (make_encoder_train_step, make_gpt_train_step,
                      make_transformer_train_step, preflight_memory_check)
