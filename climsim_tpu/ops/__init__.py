from .pallas_rnn import fused_bigru, PallasBiGRU

__all__ = ["fused_bigru", "PallasBiGRU"]
