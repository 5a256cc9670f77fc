from . import forward, loss, trainer

__all__ = ["forward", "loss", "trainer"]
