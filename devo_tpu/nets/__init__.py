from . import blocks, encoder, selector, update, evonet
from .evonet import EVONet, Patchifier

__all__ = ["blocks", "encoder", "selector", "update", "evonet", "EVONet", "Patchifier"]
