from .timing import chain_time, drain
from .profiling import trace, op_report, Timer

__all__ = ["chain_time", "drain", "trace", "op_report", "Timer"]
