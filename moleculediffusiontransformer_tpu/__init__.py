"""moleculediffusiontransformer_tpu — TPU-native molecular diffusion + transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lamm-mit/MoleculeDiffusionTransformer (see SURVEY.md for the reference map).
"""
__version__ = "0.1.0"
