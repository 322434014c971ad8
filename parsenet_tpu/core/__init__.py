"""Config, guards, checkpointing, logging, profiling."""
from .config import Config, load_config
from .guards import EPS, guard_exp, guard_sqrt, highest_precision
