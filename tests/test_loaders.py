import os

import numpy as np
import pytest

from tacotron2_tpu.data.loader import Prefetcher, TacotronDataset
from tacotron2_tpu.data.wavenet_loader import WaveNetDataset


def _write_corpus(tmp_path, hp, n=12):
    """Fake preprocessed training_data dir + train.txt."""
    base = str(tmp_path / 'training_data')
    os.makedirs(os.path.join(base, 'mels'))
    os.makedirs(os.path.join(base, 'linear'))
    os.makedirs(os.path.join(base, 'audio'))
    rng = np.random.default_rng(0)
    hop = hp.get_hop_size()
    rows = []
    for i in range(n):
        frames = 20 + 7 * i
        mel = rng.uniform(-4, 4, (frames, hp.num_mels)).astype(np.float32)
        lin = rng.uniform(-4, 4, (frames, hp.num_freq)).astype(np.float32)
        wav = rng.uniform(-0.5, 0.5, frames * hop).astype(np.float32)
        np.save(os.path.join(base, 'mels', f'mel-{i}.npy'), mel)
        np.save(os.path.join(base, 'linear', f'linear-{i}.npy'), lin)
        np.save(os.path.join(base, 'audio', f'audio-{i}.npy'), wav)
        rows.append(f'audio-{i}.npy|mel-{i}.npy|linear-{i}.npy|{frames * hop}|{frames}|utterance {i}.')
    meta = os.path.join(base, 'train.txt')
    with open(meta, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    return base, meta


@pytest.fixture()
def small_hp(hp):
    hp.tacotron_batch_size = 4
    hp.tacotron_test_size = None
    hp.tacotron_test_batches = 1
    hp.bucket_group_batches = 2
    hp.pad_mel_multiple = 16
    hp.outputs_per_step = 2
    hp.num_freq = 65
    return hp


def test_tacotron_loader_batches(tmp_path, small_hp):
    hp = small_hp
    base, meta = _write_corpus(tmp_path, hp)
    ds = TacotronDataset(meta, hp, base_dir=base)
    assert len(ds) + hp.tacotron_batch_size * ds.test_steps == 12

    it = ds.train_batches(seed=0)
    b = next(it)
    B = hp.tacotron_batch_size
    assert b['inputs'].shape[0] == B
    # text padded to a multiple of pad_text_multiple with pad id 0
    assert b['inputs'].shape[1] % hp.pad_text_multiple == 0
    for i in range(B):
        L = b['input_lengths'][i]
        assert (b['inputs'][i, L:] == 0).all()
    # mel padded to a multiple of r AND the coarse bucket, pad value -max_abs
    T = b['mel_targets'].shape[1]
    assert T % hp.outputs_per_step == 0 and T % 16 == 0
    for i in range(B):
        L = b['targets_lengths'][i]
        if L < T:
            assert np.allclose(b['mel_targets'][i, L:], -hp.max_abs_value)
            # stop tokens: 1 from the last real frame onwards
            assert (b['stop_token_targets'][i, L - 1:] == 1.0).all()
        assert (b['stop_token_targets'][i, :L - 1] == 0.0).all()
    assert b['linear_targets'].shape == (B, T, hp.num_freq)


def test_tacotron_loader_bucketing(tmp_path, small_hp):
    hp = small_hp
    base, meta = _write_corpus(tmp_path, hp)
    ds = TacotronDataset(meta, hp, base_dir=base)
    it = ds.train_batches(seed=0)
    # bucketing sorts by mel length: within one group, batch max lengths vary little
    batches = [next(it) for _ in range(2)]
    total_spread = 7 * 11  # corpus lengths span 20..97 frames
    for b in batches:
        spread = b['targets_lengths'].max() - b['targets_lengths'].min()
        # sorted groups → a batch covers a contiguous slice, far below the full span
        assert spread < total_spread * 0.75


def test_tacotron_test_batches_fixed(tmp_path, small_hp):
    hp = small_hp
    base, meta = _write_corpus(tmp_path, hp)
    ds = TacotronDataset(meta, hp, base_dir=base)
    tb1 = ds.test_batches()
    tb2 = ds.test_batches()
    assert len(tb1) == ds.test_steps
    np.testing.assert_array_equal(tb1[0]['inputs'], tb2[0]['inputs'])


def test_transfer_dtype_float16(tmp_path, small_hp):
    """transfer_dtype='float16' ships the float batch arrays as f16 on the wire
    (halves host->device feed bandwidth; JAX promotes them back to f32 arithmetic
    on device — validated end-to-end through both train steps in dev smokes)."""
    hp = small_hp.replace(transfer_dtype='float16')
    base, meta = _write_corpus(tmp_path, hp, n=8)
    ds = TacotronDataset(meta, hp, base_dir=base)
    b = next(ds.train_batches(seed=0))
    assert b['mel_targets'].dtype == np.float16
    assert b['stop_token_targets'].dtype == np.float16
    if 'linear_targets' in b:
        assert b['linear_targets'].dtype == np.float16
    assert b['inputs'].dtype == np.int32  # integer arrays stay exact


def test_prefetcher_propagates_and_stops():
    def gen():
        yield 1
        yield 2
        raise ValueError('boom')
    p = Prefetcher(gen(), depth=2)
    assert next(p) == 1
    assert next(p) == 2
    with pytest.raises(ValueError):
        next(p)
    p.close()


def test_wavenet_loader(tmp_path, hp):
    hp.train_with_GTA = False  # consuming ground-truth train.txt, not a GTA map
    hp.wavenet_batch_size = 2
    hp.wavenet_test_size = None
    hp.wavenet_test_batches = 1
    hp.max_time_steps = 2200
    base, meta = _write_corpus(tmp_path, hp)
    ds = WaveNetDataset(meta, hp, base_dir=base)
    b = next(ds.train_batches(seed=0, group_batches=2))
    hop = hp.get_hop_size()
    max_steps = hp.max_time_steps - hp.max_time_steps % hop
    # static crop shape
    assert b['audio'].shape == (2, max_steps)
    assert b['mel_conditions'].shape == (2, max_steps // hop, hp.num_mels)
    # conditions rescaled to [0, 1]
    assert b['mel_conditions'].min() >= 0.0 and b['mel_conditions'].max() <= 1.0
    assert (b['input_lengths'] <= max_steps).all()


def test_wavenet_loader_gta_map(tmp_path, hp):
    """GTA map rows (wav|gt_mel|gta_mel|g|text) select the GTA mel column."""
    hp.wavenet_batch_size = 2
    hp.wavenet_test_size = None
    hp.wavenet_test_batches = 1
    hp.max_time_steps = 2200
    base, meta = _write_corpus(tmp_path, hp)
    gta_meta = os.path.join(base, 'map.txt')
    with open(meta) as f, open(gta_meta, 'w') as g:
        for line in f:
            p = line.strip().split('|')
            g.write(f"{os.path.join(base, 'audio', p[0])}|{os.path.join(base, 'mels', p[1])}|"
                    f"{os.path.join(base, 'mels', p[1])}|<no_g>|{p[5]}\n")
    ds = WaveNetDataset(gta_meta, hp, base_dir='')
    b = next(ds.train_batches(seed=0, group_batches=1))
    assert b['audio'].ndim == 2
