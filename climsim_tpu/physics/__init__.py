from . import thermo, transforms, conservation, radiation, cloud_optics

__all__ = ["thermo", "transforms", "conservation", "radiation",
           "cloud_optics"]
