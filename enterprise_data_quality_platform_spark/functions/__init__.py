from . import numeric, text, vectors

__all__ = ["numeric", "text", "vectors"]
