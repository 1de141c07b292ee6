from .debug import debug_mode, enable_debug
from .timing import steady_state_ms, time_once_ms

__all__ = ["steady_state_ms", "time_once_ms", "debug_mode", "enable_debug"]
