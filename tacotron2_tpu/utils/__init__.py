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


def suppress_stop_tokens(params, push: float = -100.0):
    """Push the Tacotron stop-projection bias so stop tokens never fire.

    Benchmark/latency harnesses on random-init weights (bench.py,
    scripts/dev_make_ttfa_ckpts.py) need the decode to run exactly `max_iters`
    steps — an untrained stop token is a coin flip that would otherwise stop at
    the 4r-frame synthesizer floor and flatter the measurement. Works on host
    or device pytrees; returns a new params tree."""
    import jax
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    sp = params['decoder']['stop_projection']
    sp['bias'] = sp['bias'] + push
    return params
