from .mlp import MLP, mlp_for, output_prune_mask
from .common import Policy, F32, BF16

__all__ = ["MLP", "mlp_for", "output_prune_mask", "Policy", "F32", "BF16"]
