"""Model families: QM9 diffusion (forward + inverse), transformers, audio
lineage assemblies, graph analogs."""
from .qm_diffusion import (QMDiffusion, QMDiffusionBase, QMDiffusionForward,
                           from_config, inpaint, sample)
