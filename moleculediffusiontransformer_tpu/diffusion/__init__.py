from .distributions import (LogNormalDistribution, SigmaDistribution,
                            UniformDistribution, VKDistribution,
                            make_distribution)
from .objectives import (KDiffusion, Objective, VDiffusion, VKDiffusion,
                         clip, make_objective, pad_dims, to_batch)
from .samplers import (SAMPLER_COMPAT, adpm2_sigmas, adpm2_step,
                       inpaint_adpm2, sample, sample_adpm2, sample_aeuler,
                       sample_karras, sample_v, sequential_mask,
                       span_by_span_compose)
from .schedules import karras_schedule, linear_schedule, make_schedule

__all__ = [
    "LogNormalDistribution", "SigmaDistribution", "UniformDistribution",
    "VKDistribution", "make_distribution",
    "KDiffusion", "Objective", "VDiffusion", "VKDiffusion", "clip",
    "make_objective", "pad_dims", "to_batch",
    "SAMPLER_COMPAT", "adpm2_sigmas", "adpm2_step", "inpaint_adpm2",
    "sample", "sample_adpm2", "sample_aeuler", "sample_karras", "sample_v",
    "sequential_mask", "span_by_span_compose",
    "karras_schedule", "linear_schedule", "make_schedule",
]
