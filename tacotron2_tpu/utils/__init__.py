class ValueWindow:
    """Rolling window average (reference tacotron/utils/__init__.py:1-22)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values = []

    def append(self, x: float):
        self._values = self._values[-(self._window_size - 1):] + [x]

    @property
    def sum(self):
        return sum(self._values)

    @property
    def count(self):
        return len(self._values)

    @property
    def average(self):
        return self.sum / max(1, self.count)

    def reset(self):
        self._values = []


def round_up(x: int, multiple: int) -> int:
    """Round x up to the next multiple (shared by loaders/synthesizers/kernels)."""
    r = x % multiple
    return x if r == 0 else x + multiple - r


def round_down(x: int, multiple: int) -> int:
    return x - (x % multiple)
