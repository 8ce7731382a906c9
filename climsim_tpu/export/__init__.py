from .wrapper import OnlineWrapper, WrapperConfig, flat_output
from .serialize import export_step, load_step, export_wrapper

__all__ = ["OnlineWrapper", "WrapperConfig", "flat_output", "export_step",
           "load_step", "export_wrapper"]
