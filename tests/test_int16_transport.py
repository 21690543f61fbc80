"""The int16 half-byte transport for the sharded pipelines
(parallel/transfer.py): 16-bit-PCM-exact float batches ship as int16 and
rescale on device BIT-IDENTICALLY; anything else falls back to a plain
sharded device_put. The end-to-end guarantee (device pipeline == cached
path) is pinned by tests/test_dp_families.py and test_cli.py — these tests
pin the transport contract itself."""

import numpy as np
import pytest

from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.parallel.transfer import ship_dp_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, tp=1)


def _pcm_batch(rng, shape):
    return (rng.integers(-32768, 32768, size=shape).astype(np.int16) / 32768.0).astype(
        np.float32
    )


def test_exact_pcm_ships_int16_bit_identical(mesh):
    rng = np.random.default_rng(0)
    x = _pcm_batch(rng, (8, 640))
    x[3, 100:] = 0.0  # zero padding rows stay exact
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert was_int16
    assert arr.dtype == np.float32
    # Bit-identical to the f32 values that would have shipped directly.
    assert np.array_equal(np.asarray(arr), x)


def test_extreme_pcm_values_round_trip(mesh):
    # -32768 (the asymmetric int16 min) and 32767 are both in range.
    x = np.array([[-1.0, 32767.0 / 32768.0, 0.0, 1.0 / 32768.0]] * 8, np.float32)
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_non_pcm_falls_back_to_plain_put(mesh):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 64)).astype(np.float32)  # not int16-exact
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert not was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_out_of_range_pcm_falls_back(mesh):
    x = np.full((8, 4), 2.0, np.float32)  # |x*32768| > 32767 but integral
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert not was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_non_float_passes_through(mesh):
    x = np.arange(16, dtype=np.int32).reshape(8, 2)
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert not was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_env_knob_disables_transport(mesh, monkeypatch):
    monkeypatch.setenv("FADTK_TPU_INT16_TRANSPORT", "0")
    rng = np.random.default_rng(4)
    x = _pcm_batch(rng, (8, 64))
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert not was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_try_int16_false_skips_probe(mesh):
    rng = np.random.default_rng(2)
    x = _pcm_batch(rng, (8, 64))
    arr, was_int16 = ship_dp_sharded(mesh, x, try_int16=False)
    assert not was_int16
    assert np.array_equal(np.asarray(arr), x)


def test_output_sharded_over_dp(mesh):
    rng = np.random.default_rng(3)
    x = _pcm_batch(rng, (8, 64))
    arr, was_int16 = ship_dp_sharded(mesh, x)
    assert was_int16
    # Leading axis sharded over dp: each addressable shard holds 1 row.
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(1, 64)}
