from . import schedules

__all__ = ['schedules']
