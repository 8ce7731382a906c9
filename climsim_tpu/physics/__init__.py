from . import thermo, transforms, conservation

__all__ = ["thermo", "transforms", "conservation"]
