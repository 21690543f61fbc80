"""Device scoring tests: FAD-inf sweep and per-song batches agree with the host
float64 paths within the float32/NS tolerance."""

import numpy as np

from fadtk_tpu.metric.device_scoring import fad_inf_device, per_song_fad_device
from fadtk_tpu.metric.frechet import frechet_distance
from fadtk_tpu.metric.stats import calc_embd_statistics


def _gaussian_frames(rng, n, d, shift=0.0):
    return (rng.standard_normal((n, d)) + shift).astype(np.float16)


def test_per_song_matches_host():
    rng = np.random.default_rng(0)
    d = 48
    base = _gaussian_frames(rng, 4000, d)
    mu1, cov1 = calc_embd_statistics(base.astype(np.float64))

    songs = [_gaussian_frames(rng, n, d, shift=0.5) for n in (300, 150, 220, 180, 90)]
    device = per_song_fad_device(mu1, cov1, songs, batch_size=2)

    for i, song in enumerate(songs):
        host = frechet_distance(
            mu1, cov1, *calc_embd_statistics(song), method="eigh"
        )
        assert abs(device[i] - host) / max(abs(host), 1e-6) < 2e-2, (i, device[i], host)


def test_fad_inf_device_reasonable():
    """Device FAD-inf must land near the host FAD-inf and have a sane fit."""
    rng = np.random.default_rng(1)
    d = 32
    base = _gaussian_frames(rng, 5000, d)
    mu1, cov1 = calc_embd_statistics(base.astype(np.float64))
    evals = _gaussian_frames(rng, 3000, d, shift=0.3)

    score, slope, r2, points = fad_inf_device(
        mu1, cov1, evals, steps=8, min_n=300, seed=0
    )
    assert len(points) == 8
    assert np.isfinite(score) and np.isfinite(slope)
    assert r2 > 0.5  # FAD(n) is strongly 1/n-linear for Gaussian data

    # The extrapolated score should approximate the full-sample FAD.
    full = frechet_distance(mu1, cov1, *calc_embd_statistics(evals), method="eigh")
    assert abs(score - full) / full < 0.25


def test_fad_inf_device_seeded():
    rng = np.random.default_rng(2)
    d = 16
    base = _gaussian_frames(rng, 2000, d)
    mu1, cov1 = calc_embd_statistics(base.astype(np.float64))
    evals = _gaussian_frames(rng, 1500, d, shift=0.2)
    a = fad_inf_device(mu1, cov1, evals, steps=5, min_n=200, seed=7)
    b = fad_inf_device(mu1, cov1, evals, steps=5, min_n=200, seed=7)
    assert a[0] == b[0]
