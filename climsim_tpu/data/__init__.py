from .normalization import (Normalizer, LevelNormalizer, load_exp_lambdas,
                            save_norm_txt)
from .h5store import KeeplevWriter, KeeplevReader, concatenate, \
    write_timeseries
from .loader import (chunkize, keeplev_chunks, stream_keeplev_chunks,
                     prefetch_to_device, flat_batches)

__all__ = ["Normalizer", "LevelNormalizer", "load_exp_lambdas",
           "save_norm_txt", "KeeplevWriter", "KeeplevReader", "concatenate",
           "write_timeseries", "chunkize",
           "keeplev_chunks", "stream_keeplev_chunks", "prefetch_to_device",
           "flat_batches"]
