from .normalization import Normalizer, LevelNormalizer, load_exp_lambdas

__all__ = ["Normalizer", "LevelNormalizer", "load_exp_lambdas"]
