"""climsim_tpu — TPU-native hybrid climate stencil + emulator framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
peterukk/ClimSim (E3SM-MMF cloud-resolving-model emulation benchmark plus
its rollout-trained RNN fork): device-resident data/normalization pipeline,
the offline emulator zoo, autoregressive rollout training with latent
convective memory, conservation-aware losses, the standardized weighted
metric suite, and an online hybrid host loop with advection stencils
domain-decomposed over TPU meshes.
"""
from . import constants, variables
from .grid import Grid

__version__ = "0.1.0"
__all__ = ["constants", "variables", "Grid"]
