from . import bronze, fixtures, gold, quality, silver

__all__ = ["bronze", "fixtures", "gold", "quality", "silver"]
