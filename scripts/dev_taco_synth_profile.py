#!/usr/bin/env python
"""Profile the Tacotron free-running synthesis decode at full size.

Train-mode decoder forward runs ~24 us/step (batch 32); synthesis decode measures
~280 us/step (batch 8). This captures an xplane trace of the chunked while_loop
decode to find where the gap lives (per-op latency vs scheduling vs buffer copies).

Run from the repo root on the TPU box: python scripts/dev_taco_synth_profile.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.tacotron.model import Tacotron


def main():
    B, T_in, dec_frames = 8, 128, 704
    hp = default_hparams()
    taco = Tacotron(hp, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    inputs = jax.random.randint(rng, (B, T_in), 2, 60)
    input_lengths = jnp.full((B,), T_in, jnp.int32)
    init_rngs = {'params': rng, 'dropout': rng, 'zoneout': rng, 'teacher': rng}
    variables = jax.jit(partial(taco.init, deterministic=True, max_iters=2,
                                predict_linear=False))(init_rngs, inputs, input_lengths)
    sp = variables['params']['decoder']['stop_projection']
    sp['bias'] = sp['bias'] - 100.0  # run the full decode, no early exit

    def synth(v, i, il):
        out = taco.apply(v, i, il, max_iters=dec_frames, deterministic=True,
                         predict_linear=False, rngs={'dropout': jax.random.PRNGKey(1)})
        return out['mel_outputs']

    def time_decode(f):
        """Compile, then best-of-3 wall time with a host-fetch fence."""
        np.asarray(f(variables, inputs, input_lengths))
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(variables, inputs, input_lengths))
            best = min(best, time.time() - t0)
        return best

    # max_iters IS decoder steps (each step emits outputs_per_step frames)
    steps = dec_frames
    best = time_decode(jax.jit(synth))
    print(f'synthesis decode: {best*1e3:.1f} ms for {steps} decoder steps '
          f'({best*1e6/steps:.1f} us/step, batch {B})')

    # hypothesis test: per-step dropout-RNG (threefry inside the scan) cost
    hp0 = hp.replace(tacotron_dropout_rate=0.0)
    taco0 = Tacotron(hp0, dtype=jnp.bfloat16)

    def synth0(v, i, il):
        out = taco0.apply(v, i, il, max_iters=dec_frames, deterministic=True,
                          predict_linear=False, rngs={'dropout': jax.random.PRNGKey(1)})
        return out['mel_outputs']

    fn = jax.jit(synth)  # keep the default-variant fn for the trace below
    best0 = time_decode(jax.jit(synth0))
    print(f'dropout=0 decode:  {best0*1e3:.1f} ms ({best0*1e6/steps:.1f} us/step) '
          f'— delta vs default = per-step RNG cost')

    out_dir = '/tmp/taco_synth_trace'
    jax.profiler.start_trace(out_dir)
    np.asarray(fn(variables, inputs, input_lengths))
    jax.profiler.stop_trace()
    print('trace written to', out_dir)


if __name__ == '__main__':
    main()
