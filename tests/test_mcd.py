"""MCD-DTW quality metric (ops/mcd.py)."""

import numpy as np

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.ops import mcd


def _naive_dtw(dist):
    T1, T2 = dist.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, T1 + 1):
        for j in range(1, T2 + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1])
    return acc[T1, T2]


def test_dtw_matches_naive():
    rng = np.random.default_rng(0)
    for shape in ((5, 5), (17, 9), (30, 41)):
        dist = rng.uniform(0.1, 2.0, shape)
        mean, n = mcd.dtw_path_mean(dist)
        assert n >= max(shape) and n <= sum(shape)
        assert abs(mean * n - _naive_dtw(dist)) < 1e-9


def test_identical_mels_zero_mcd():
    hp = default_hparams()
    rng = np.random.default_rng(1)
    mel = rng.uniform(-hp.max_abs_value, hp.max_abs_value, (40, hp.num_mels))
    assert mcd.mcd_dtw(mel, mel, hp) < 1e-3


def test_dtw_path_endpoints_and_monotonicity():
    rng = np.random.default_rng(3)
    dist = rng.uniform(0.1, 2.0, (23, 31))
    mean, path = mcd.dtw_path(dist)
    assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (22, 30)
    steps = np.diff(path, axis=0)
    assert (steps >= 0).all() and (steps.max(axis=1) == 1).all()
    assert abs(mean * len(path) - _naive_dtw(dist)) < 1e-9


def _band_mel(hp, bands, frames_per_band, rng, jitter=0.0):
    """Synthetic normalized mel: a moving band bump + noise floor."""
    rows = []
    for b in bands:
        n = max(2, int(round(frames_per_band * (1.0 + jitter * rng.uniform(-1, 1)))))
        bump = np.exp(-0.5 * ((np.arange(hp.num_mels) - b) / 3.0) ** 2)
        x = -hp.max_abs_value + (1.6 * hp.max_abs_value) * bump
        rows.append(np.tile(x, (n, 1)) + rng.normal(0, 0.05, (n, hp.num_mels)))
    return np.clip(np.concatenate(rows), -hp.max_abs_value, hp.max_abs_value)


def test_centroid_corr_dtw_marginalizes_timing_not_content():
    """Same band sequence with warped timing scores ~1; a different band
    sequence scores well below (the timing-robust conditioning metric)."""
    hp = default_hparams()
    rng = np.random.default_rng(4)
    bands = rng.integers(10, 70, 12)
    a = _band_mel(hp, bands, 10, rng)
    warped = _band_mel(hp, bands, 10, rng, jitter=0.3)
    other = _band_mel(hp, rng.permutation(bands), 10, rng)
    r_warp = mcd.centroid_corr_dtw(a, warped, hp)
    r_other = mcd.centroid_corr_dtw(a, other, hp)
    assert r_warp > 0.97
    assert r_other < r_warp - 0.1


def test_time_warp_invariance_and_ordering():
    """A frame-duplicated copy DTW-aligns back to ~0; genuinely different
    content scores higher than a warped copy."""
    hp = default_hparams()
    rng = np.random.default_rng(2)
    # smooth trajectory so duplicated frames are plausible warps
    base = np.cumsum(rng.normal(0, 0.1, (50, hp.num_mels)), axis=0)
    base = np.clip(base, -hp.max_abs_value, hp.max_abs_value)
    warped = np.repeat(base, 2, axis=0)  # 2x slower rendition
    other = np.clip(np.cumsum(rng.normal(0, 0.1, (50, hp.num_mels)), axis=0),
                    -hp.max_abs_value, hp.max_abs_value)
    d_warp = mcd.mcd_dtw(base, warped, hp)
    d_other = mcd.mcd_dtw(base, other, hp)
    assert d_warp < 1e-3
    assert d_other > d_warp + 1.0
