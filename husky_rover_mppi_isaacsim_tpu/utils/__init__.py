from .timer import ScopedTimer, timed

__all__ = ["ScopedTimer", "timed"]
