"""WaveNet synthesis input resolution (reference wavenet_vocoder/synthesize.py:12-40):
a map.txt path, a dir of mel npys, a dir *containing* map.txt (texts preserved —
the bug fixed in round 5), and GTA-format maps."""

import os

import numpy as np

from tacotron2_tpu.inference.wavenet_synthesizer import resolve_mels_input


def _mk_mels(d, names):
    for n in names:
        np.save(os.path.join(d, n), np.zeros((3, 4), np.float32))


def test_bare_dir_of_npys(tmp_path):
    d = str(tmp_path)
    _mk_mels(d, ['mel-b.npy', 'mel-a.npy'])
    texts, files = resolve_mels_input(d)
    assert texts == ['', '']
    assert [os.path.basename(f) for f in files] == ['mel-a.npy', 'mel-b.npy']


def test_dir_with_eval_map_keeps_texts(tmp_path):
    d = str(tmp_path)
    _mk_mels(d, ['mel-a.npy', 'mel-b.npy'])
    with open(os.path.join(d, 'map.txt'), 'w') as f:
        f.write(f'hello world|{d}/mel-a.npy\n')
        f.write(f'second text|{d}/mel-b.npy\n')
    texts, files = resolve_mels_input(d)
    assert texts == ['hello world', 'second text']
    assert [os.path.basename(f) for f in files] == ['mel-a.npy', 'mel-b.npy']


def test_map_file_path_gta_format(tmp_path):
    d = str(tmp_path)
    _mk_mels(d, ['gta-a.npy'])
    m = os.path.join(d, 'gta_map.txt')
    with open(m, 'w') as f:
        f.write(f'wav-a.npy|mel-a.npy|{d}/gta-a.npy|<no_g>|the text\n')
    texts, files = resolve_mels_input(m)
    assert texts == ['the text']
    assert files == [f'{d}/gta-a.npy']


def test_wavenet_preprocess_map_bare_filenames(tmp_path):
    # wavenet_preprocess.py writes audio|mel|mel|g|timesteps|mel_frames with
    # bare filenames living under <out_dir>/mels/ — synthesis from that map
    # used to FileNotFoundError on the bare name
    d = str(tmp_path)
    os.makedirs(os.path.join(d, 'mels'))
    _mk_mels(os.path.join(d, 'mels'), ['mel-a.npy', 'mel-b.npy'])
    with open(os.path.join(d, 'map.txt'), 'w') as f:
        f.write('audio-a.npy|mel-a.npy|mel-a.npy|<no_g>|13475|49\n')
        f.write('audio-b.npy|mel-b.npy|mel-b.npy|<no_g>|13475|49\n')
    texts, files = resolve_mels_input(d)
    assert texts == ['', '']
    assert files == [os.path.join(d, 'mels', 'mel-a.npy'),
                     os.path.join(d, 'mels', 'mel-b.npy')]
    for f_ in files:
        assert os.path.isfile(f_)
