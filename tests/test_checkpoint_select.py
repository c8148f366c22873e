"""Natural-eval checkpoint selection (tacotron2_tpu/training/checkpoint_select.py).

Pins the round-5 operational rule: the WaveNet AR conditioning response peaks
and then collapses while the teacher-forced loss keeps improving
(docs/round5/RESULTS.md §3 — r 0.961 at 10k → 0.433 at 25k), so synthesis must
be able to resolve 'best' from the training loop's eval history instead of
blindly loading the latest checkpoint (the reference's only behavior,
reference wavenet_vocoder/synthesize.py:30-57).
"""

import json
import os

import numpy as np

from tacotron2_tpu.training import checkpoint_select as cs
from tacotron2_tpu.training.checkpointing import CheckpointManager


def _write_history(ckpt_dir, records):
    path = cs.eval_history_path(ckpt_dir)
    with open(path, 'w', encoding='utf-8') as f:
        for r in records:
            f.write(json.dumps(r) + '\n')
    return path


def test_sidecar_lives_outside_the_checkpoint_dir(tmp_path):
    # orbax owns the checkpoint dir's contents (it enumerates step subdirs);
    # the history file must not be created inside it
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    path = cs.eval_history_path(str(d))
    assert os.path.dirname(path) == str(tmp_path)
    assert 'wave_pretrained' in os.path.basename(path)


def test_append_and_reload_roundtrip(tmp_path):
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    cs.append_eval_record(str(d), dict(step=500, ar_conditioning_r=0.7,
                                       natural_loss=None))  # None values dropped
    cs.append_eval_record(str(d), dict(step=1000, ar_conditioning_r=0.9))
    recs = cs.load_eval_history(str(d))
    assert [r['step'] for r in recs] == [500, 1000]
    assert 'natural_loss' not in recs[0]


def test_best_metric_is_the_overfit_cliff_shape(tmp_path):
    # the measured cliff: r peaks mid-training while TF loss keeps improving —
    # selection must pick the r peak, not the last (lowest-TF-loss) step
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    _write_history(str(d), [
        dict(step=5000, ar_conditioning_r=0.758, teacher_forced_loss=-4.1),
        dict(step=10000, ar_conditioning_r=0.961, teacher_forced_loss=-4.3),
        dict(step=15000, ar_conditioning_r=0.951, teacher_forced_loss=-4.35),
        dict(step=20000, ar_conditioning_r=0.644, teacher_forced_loss=-4.4),
        dict(step=25000, ar_conditioning_r=0.433, teacher_forced_loss=-4.41),
    ])
    step, reason = cs.resolve_best_checkpoint(
        str(d), available_steps=[5000, 10000, 15000, 20000, 25000])
    assert step == 10000
    assert 'ar_conditioning_r' in reason


def test_metric_fallback_order(tmp_path):
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    # no conditioning metric recorded (e.g. unconditional run): natural_loss
    # (lower better) decides; teacher_forced_loss must not override it
    _write_history(str(d), [
        dict(step=100, natural_loss=2.0, teacher_forced_loss=1.0),
        dict(step=200, natural_loss=1.5, teacher_forced_loss=0.5),
        dict(step=300, natural_loss=1.8, teacher_forced_loss=0.1),
    ])
    step, reason = cs.resolve_best_checkpoint(str(d), [100, 200, 300])
    assert step == 200 and 'natural_loss' in reason
    # only TF loss present: last resort
    _write_history(str(d), [dict(step=100, teacher_forced_loss=1.0),
                            dict(step=200, teacher_forced_loss=0.4)])
    step, reason = cs.resolve_best_checkpoint(str(d), [100, 200])
    assert step == 200 and 'teacher_forced_loss' in reason


def test_best_eval_step_maps_to_nearest_retained_checkpoint(tmp_path):
    # eval_interval != checkpoint_interval, and orbax prunes old steps: the
    # best eval step may not exist as a checkpoint
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    _write_history(str(d), [dict(step=900, ar_conditioning_r=0.95),
                            dict(step=1800, ar_conditioning_r=0.40)])
    step, reason = cs.resolve_best_checkpoint(str(d), [1000, 2000])
    assert step == 1000
    assert 'nearest retained' in reason
    # tie (equidistant): prefer the earlier step — before a measured cliff
    # is safer than after it
    assert cs.nearest_step(1500, [1000, 2000]) == 1000


def test_no_history_returns_none(tmp_path):
    d = tmp_path / 'wave_pretrained'
    d.mkdir()
    assert cs.resolve_best_checkpoint(str(d), [100]) is None
    # corrupt lines are skipped, not fatal
    with open(cs.eval_history_path(str(d)), 'w') as f:
        f.write('not json\n{"no_step": 1}\n')
    assert cs.resolve_best_checkpoint(str(d), [100]) is None


def test_checkpoint_manager_all_steps_and_step_restore(tmp_path):
    # all_steps + restore(step=) are what 'best' resolution rides on
    d = str(tmp_path / 'ckpt')
    mgr = CheckpointManager(d, max_to_keep=5)
    tpl = {'w': np.zeros((2,), np.float32), 'step': np.int32(0)}
    for s in (10, 20, 30):
        mgr.save(s, {'w': np.full((2,), float(s), np.float32),
                     'step': np.int32(s)})
    assert mgr.all_steps() == [10, 20, 30]
    restored = mgr.restore(tpl, step=20)
    assert float(np.asarray(restored['w'])[0]) == 20.0
    mgr.close()


def test_streaming_load_passes_wavenet_step(monkeypatch):
    # serve.py / stream mode must honor --wavenet_checkpoint_step: the overfit
    # cliff (docs/round5/RESULTS.md §3) makes blind-latest unsafe for serving
    from tacotron2_tpu.inference import streaming

    calls = {}

    class FakeTaco:
        def load(self, d, hp):
            calls['taco'] = d

    class FakeWN:
        def load(self, d, hp, step=None):
            calls['wn_step'] = step

    class FakeHP:
        def freeze(self):
            return self

    monkeypatch.setattr(streaming, 'TacotronSynthesizer', FakeTaco)
    monkeypatch.setattr(streaming, 'WaveNetSynthesizer', FakeWN)
    monkeypatch.setattr(streaming.StreamingSynthesizer, '_get_vocoder',
                        lambda self: None)
    streaming.StreamingSynthesizer().load('t', 'w', FakeHP(), wavenet_step='best')
    assert calls['wn_step'] == 'best'
