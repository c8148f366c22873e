#!/usr/bin/env python
"""Write full-size random-init checkpoints for streaming-latency measurement.

measure_ttfa.py needs serve.py running with FULL-SIZE models on the chip;
time-to-first-audio and chunk cadence are pure latency/throughput quantities,
so random-init weights measure the same thing a trained checkpoint would
(the compute graph is identical). Two tweaks make the harness deterministic:

  - the Tacotron stop-projection bias is pushed to -100 so untrained stop
    tokens never fire: the decode runs exactly `max_iters` steps (pass a
    bounded max_iters via --hparams to serve.py, e.g. max_iters=400 -> 10 s
    of audio at r=2), instead of the untrained coin-flip stopping at the
    4r-frame floor.
  - the WaveNet EMA shadow equals the raw init (fresh state), which is what
    the synthesizer loads.

This is NOT a quality harness — see scripts/eval_freerun_quality.py for that.

Usage: python scripts/dev_make_ttfa_ckpts.py OUT_DIR [hparam_overrides]
Writes OUT_DIR/{taco_pretrained,wave_pretrained}.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    out = sys.argv[1]
    overrides = sys.argv[2] if len(sys.argv) > 2 else ''
    from tacotron2_tpu.utils import suppress_stop_tokens
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training import tacotron_trainer as tt
    from tacotron2_tpu.training import wavenet_trainer as wt
    from tacotron2_tpu.training.checkpointing import CheckpointManager

    hp = default_hparams()
    if overrides:
        hp.parse(overrides)

    dummy = dict(
        inputs=np.zeros((1, 8), np.int32),
        input_lengths=np.ones((1,), np.int32),
        mel_targets=np.zeros((1, hp.outputs_per_step, hp.num_mels), np.float32))
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), dummy)
    state = state.replace(params=suppress_stop_tokens(jax.device_get(state.params)))
    CheckpointManager(os.path.join(out, 'taco_pretrained')).save(0, state)
    print('wrote', os.path.join(out, 'taco_pretrained'))

    hop = hp.get_hop_size()
    wn_dummy = dict(
        audio=np.zeros((1, hop), np.float32),
        input_lengths=np.asarray([hop], np.int32),
        mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    wn_state = wt.create_train_state(hp, jax.random.PRNGKey(1), wn_dummy)
    CheckpointManager(os.path.join(out, 'wave_pretrained')).save(0, wn_state)
    print('wrote', os.path.join(out, 'wave_pretrained'))


if __name__ == '__main__':
    main()
