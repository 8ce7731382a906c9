from .wrapper import OnlineWrapper, WrapperConfig, flat_output

__all__ = ["OnlineWrapper", "WrapperConfig", "flat_output"]
