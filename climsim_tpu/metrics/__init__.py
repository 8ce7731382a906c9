from .metrics import mae, rmse, r2, bias, crps
from .weighting import weight_outputs, recover_ps, split_variables
from .report import evaluate, per_level_table

__all__ = ["mae", "rmse", "r2", "bias", "crps", "weight_outputs",
           "recover_ps", "split_variables", "evaluate", "per_level_table"]
