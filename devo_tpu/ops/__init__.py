from . import ba, corr, graph, patchify

__all__ = ["ba", "corr", "graph", "patchify"]
