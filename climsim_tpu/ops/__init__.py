from .pallas_rnn import fused_bigru, PallasBiGRU
from .pallas_stencil import fv_advect_levels, fv_advect_tracers

__all__ = ["fused_bigru", "PallasBiGRU", "fv_advect_levels",
           "fv_advect_tracers"]
