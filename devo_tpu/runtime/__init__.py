from .config import EVAL_CONFIGS, VOConfig
from .engine import DEVO, VOState, init_state, make_step

__all__ = ["VOConfig", "EVAL_CONFIGS", "DEVO", "VOState", "init_state", "make_step"]
