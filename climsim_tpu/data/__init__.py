from .normalization import Normalizer, LevelNormalizer, load_exp_lambdas
from .loader import (chunkize, keeplev_chunks, prefetch_to_device,
                     flat_batches)

__all__ = ["Normalizer", "LevelNormalizer", "load_exp_lambdas", "chunkize",
           "keeplev_chunks", "prefetch_to_device", "flat_batches"]
