from .advection import (build_proxy_grid, to_grid, to_columns, fv_advect_2d,
                        semi_lagrangian_2d, conservation_fixer)
from .host_loop import HybridLoop, HostLoopConfig

__all__ = ["build_proxy_grid", "to_grid", "to_columns", "fv_advect_2d",
           "semi_lagrangian_2d", "conservation_fixer", "HybridLoop",
           "HostLoopConfig"]
