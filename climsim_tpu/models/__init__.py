from .mlp import MLP, mlp_for, output_prune_mask
from .cnn import CNN, reshape_input_for_cnn, reshape_target_from_cnn
from .ed import ED
from .hsr import HSR, hsr_nll, hsr_sample
from .rpn import RPNEnsemble
from .cvae import CVAE, cvae_loss, cvae_samples
from .unet import ClimsimUNet, unet_v4, unet_v5
from .rnn import RNNAutoreg, postprocess_mp
from .phys_rnn import PhysicalRNNAutoreg
from .phys_rad import RadiationModule, GasOpticsMLP
from .common import Policy, F32, BF16

__all__ = ["MLP", "mlp_for", "output_prune_mask", "CNN",
           "reshape_input_for_cnn", "reshape_target_from_cnn", "ED", "HSR",
           "hsr_nll", "hsr_sample", "RPNEnsemble", "CVAE", "cvae_loss",
           "cvae_samples", "ClimsimUNet", "unet_v4", "unet_v5",
           "RNNAutoreg", "postprocess_mp", "PhysicalRNNAutoreg",
           "RadiationModule", "GasOpticsMLP", "Policy", "F32", "BF16"]
