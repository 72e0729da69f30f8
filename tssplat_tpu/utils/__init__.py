from .profiling import PrintExecTime, ThroughputMeter, trace_profile
from .env import get_rank, get_world_size, init_distributed
from . import debug

__all__ = ["PrintExecTime", "ThroughputMeter", "trace_profile",
           "get_rank", "get_world_size", "init_distributed", "debug"]
