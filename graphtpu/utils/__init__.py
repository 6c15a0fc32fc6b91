from graphtpu.utils.timers import ComputationTimer, proc_time_start, proc_time_end
from graphtpu.utils.logging import get_logger

__all__ = [
    "ComputationTimer",
    "proc_time_start",
    "proc_time_end",
    "get_logger",
]
