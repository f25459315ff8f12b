from .debug import debug_dump_forward, get_powers

__all__ = ["debug_dump_forward", "get_powers"]
