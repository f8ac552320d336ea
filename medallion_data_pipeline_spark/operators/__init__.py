from . import dedup, multimodal, profiling, similarity

__all__ = ["dedup", "multimodal", "profiling", "similarity"]
