from . import dedup, multimodal, profiling, similarity, skew, temporal

__all__ = ["dedup", "multimodal", "profiling", "similarity", "skew", "temporal"]
