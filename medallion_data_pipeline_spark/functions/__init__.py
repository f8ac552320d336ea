from . import cleaning, text, vectors

__all__ = ["cleaning", "text", "vectors"]
