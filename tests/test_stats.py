"""Statistics accumulator tests: host-exact path vs numpy, device Welford vs
host, masked batches, and the psum-sharded multi-device merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fadtk_tpu.metric.stats import (
    calc_embd_statistics,
    calculate_embd_statistics_online,
    merge_partial_stats,
    statistics_from_frame_iter,
    welford_finalize,
    welford_init,
    welford_merge_across,
    welford_update,
)


def _random_frames(rng, n, d, dtype=np.float16):
    return (rng.standard_normal((n, d)) * 2.0 + 0.5).astype(dtype)


def test_calc_embd_statistics_matches_numpy():
    rng = np.random.default_rng(0)
    x = _random_frames(rng, 257, 32)
    mu, cov = calc_embd_statistics(x)
    assert mu.dtype == np.float16  # reference parity: np.mean keeps float16
    np.testing.assert_array_equal(mu, np.mean(x, axis=0))
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=0, atol=0)


def test_calc_embd_statistics_rejects_single_frame():
    with pytest.raises(AssertionError):
        calc_embd_statistics(np.zeros((1, 8), np.float16))


def test_online_statistics_match_concat(tmp_path):
    """Streaming per-file merge == one-shot stats over the concatenation
    (reference semantics: fadtk/utils.py:19-46)."""
    rng = np.random.default_rng(1)
    sizes = [7, 120, 33, 2, 64]
    files, all_frames = [], []
    for i, n in enumerate(sizes):
        x = _random_frames(rng, n, 24)
        f = tmp_path / f"e{i}.npy"
        np.save(f, x)
        files.append(f)
        all_frames.append(x)

    mu, cov = calculate_embd_statistics_online(files)
    concat = np.concatenate(all_frames, axis=0).astype(np.float64)
    np.testing.assert_allclose(mu, np.mean(concat, axis=0), atol=1e-3)
    np.testing.assert_allclose(cov, np.cov(concat, rowvar=False), atol=1e-3)


def test_merge_partial_stats_is_exactly_reference_formula():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((50, 16))
    b = rng.standard_normal((30, 16))

    mu, s, n = np.zeros(16), np.zeros((16, 16)), 0
    for x in (a, b):
        mu, s, n = merge_partial_stats(
            mu, s, n, np.mean(x, axis=0), np.cov(x, rowvar=False) * (x.shape[0] - 1), x.shape[0]
        )
    concat = np.concatenate([a, b])
    np.testing.assert_allclose(mu, np.mean(concat, axis=0), atol=1e-12)
    np.testing.assert_allclose(s / (n - 1), np.cov(concat, rowvar=False), atol=1e-12)


def test_statistics_from_frame_iter():
    rng = np.random.default_rng(3)
    chunks = [rng.standard_normal((n, 8)) for n in (5, 1, 40, 0, 17)]
    mu, cov = statistics_from_frame_iter(iter(chunks), 8)
    concat = np.concatenate([c for c in chunks if c.shape[0]], axis=0)
    np.testing.assert_allclose(mu, np.mean(concat, axis=0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(concat, rowvar=False), atol=1e-12)


def test_device_welford_matches_numpy():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((500, 32)).astype(np.float32)

    state = welford_init(32)
    for i in range(0, 500, 100):
        state = welford_update(state, jnp.asarray(x[i : i + 100]))
    mu, cov = welford_finalize(state)

    np.testing.assert_allclose(np.asarray(mu), x.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.cov(x, rowvar=False), atol=1e-4)


def test_device_welford_masked_matches_unmasked():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    mask = (np.arange(64) < 41).astype(np.float32)

    state = welford_update(welford_init(16), jnp.asarray(x), jnp.asarray(mask))
    mu, cov = welford_finalize(state)
    np.testing.assert_allclose(np.asarray(mu), x[:41].mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.cov(x[:41], rowvar=False), atol=1e-4)


def test_sharded_welford_equals_single_device():
    """Per-device partials merged with one psum == single-device statistics."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should provide 8 cpu devices, got {n_dev}"

    rng = np.random.default_rng(6)
    d = 16
    x = rng.standard_normal((n_dev * 40, d)).astype(np.float32)
    mask = (rng.random(n_dev * 40) > 0.2).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    def per_device(xs, ms):
        st = welford_update(welford_init(d), xs, ms)
        st = welford_merge_across(st, "dp")
        return welford_finalize(st)

    mu, cov = jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("dp", None), P("dp")),
            out_specs=(P(), P()),
        )
    )(jnp.asarray(x), jnp.asarray(mask))

    valid = x[mask > 0]
    np.testing.assert_allclose(np.asarray(mu), valid.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.cov(valid, rowvar=False), atol=1e-4)


def test_merge_partial_stats_device_matches_host():
    """The device-resident Chan chain (merge_partial_stats_device) equals the
    host float64 chain within float32 accumulation, including n=0 partials
    and cov-input rescaling (b_is_cov=True)."""
    import jax.numpy as jnp

    from fadtk_tpu.metric.stats import (
        merge_partial_stats,
        merge_partial_stats_device,
    )

    rng = np.random.default_rng(0)
    d = 6
    mu_h = np.zeros(d)
    s_h = np.zeros((d, d))
    n_h = 0
    state = None
    for i in range(5):
        n_b = [3, 0, 7, 1, 4][i]  # include empty and n=1 partials
        x = rng.standard_normal((max(n_b, 1), d))
        if n_b == 0:
            mu_b, m2_b = np.zeros(d), np.zeros((d, d))
        else:
            mu_b = x[:n_b].mean(0)
            m2_b = (x[:n_b] - mu_b).T @ (x[:n_b] - mu_b)
        if n_b > 0:
            mu_h, s_h, n_h = merge_partial_stats(mu_h, s_h, n_h, mu_b, m2_b, n_b)
        cov_b = m2_b / max(n_b - 1, 1)
        state = merge_partial_stats_device(
            state,
            jnp.asarray(mu_b, jnp.float32),
            jnp.asarray(cov_b, jnp.float32),
            jnp.asarray(float(n_b), jnp.float32),
            b_is_cov=True,
        )
    mu_d, s_d, n_d = (np.asarray(x, np.float64) for x in state)
    assert int(n_d) == n_h
    np.testing.assert_allclose(mu_d, mu_h, atol=1e-5)
    np.testing.assert_allclose(s_d, s_h, atol=1e-4)
