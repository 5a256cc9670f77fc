from . import projective

__all__ = ["projective"]
