"""Process-level JAX runtime setup shared by the CLIs.

- persistent compilation cache: full-size train steps take minutes to compile; the
  cache makes restarts and the 3-phase pipeline (fresh graphs per phase in the
  reference, reference train.py:53,68) effectively free after the first run
- rbg PRNG: ~11% faster Tacotron train step than threefry (the decoder scan draws
  zoneout/dropout bits every step)
"""

import os


def setup_runtime(cache_dir: str = None, fast_rng: bool = True) -> None:
    import jax

    # multi-host first: jax.distributed.initialize must precede backend init
    # (no-op unless T2_DISTRIBUTED=1 / JAX_COORDINATOR_ADDRESS is set)
    from ..parallel import distributed
    distributed.maybe_initialize()

    cache_dir = cache_dir or os.environ.get('TACO_COMPILE_CACHE',
                                            os.path.expanduser('~/.cache/tacotron2_tpu_xla'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    if fast_rng:
        try:
            jax.config.update('jax_default_prng_impl', 'rbg')
        except Exception:
            pass
