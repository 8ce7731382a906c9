from .pallas_rnn import fused_bigru, PallasBiGRU
from .pallas_stencil import (fv_advect_levels, fv_advect_tracers,
                             fv_advect_tracers_sphere)

__all__ = ["fused_bigru", "PallasBiGRU", "fv_advect_levels",
           "fv_advect_tracers", "fv_advect_tracers_sphere"]


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (the axon tunnel
    registers as platform 'tpu'). Shared gate for the kernel fast
    paths."""
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
