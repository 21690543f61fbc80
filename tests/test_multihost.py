"""parallel/multihost.py coverage (round-3 verdict #4 — it was the last
"exists but never run" component).

Three layers:
1. Unit: global_mesh's (dp, tp) layout keeps every tp group within one host's
   local devices (the "tensor-parallel psums ride ICI, never DCN" claim),
   verified against a simulated 2-hosts x 4-local split of the 8 virtual CPU
   devices.
2. Two-process smoke: spawn two CPU processes, jax.distributed.initialize on
   a localhost coordinator (Gloo collectives), build the global mesh, and run
   the dp-sharded Welford statistics merge — the pipeline's actual psum
   collective — asserting both ranks produce the host-exact global stats.
3. CLI: `fadtk ... --device-pipeline --multihost` executes end-to-end in a
   single-process jax.distributed world (coordinator self), covering the one
   CLI branch nothing previously ran.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

import jax

from fadtk_tpu.parallel import multihost

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _sub_env(**extra: str) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    env.update(extra)
    return env


# --------------------------------------------------------------------------- #
# 1. Mesh layout units (mocked host split, real devices)
# --------------------------------------------------------------------------- #


def test_global_mesh_tp_groups_stay_within_host(monkeypatch):
    """Simulate 2 hosts x 4 local devices over the 8 real CPU devices: every
    tp row of the mesh must consist of one host's devices only."""
    local = 4
    monkeypatch.setattr(jax, "local_device_count", lambda: local)
    by_id = {d.id: d for d in jax.devices()}
    host_of = {i: i // local for i in by_id}  # contiguous ids per host

    for tp in (1, 2, 4):
        mesh = multihost.global_mesh(tp=tp)
        assert mesh.shape == {"dp": 8 // tp, "tp": tp}
        for row in mesh.devices.reshape(-1, tp):
            hosts = {host_of[d.id] for d in row}
            assert len(hosts) == 1, f"tp={tp} group spans hosts {hosts}"


def test_global_mesh_rejects_tp_crossing_hosts(monkeypatch):
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    with pytest.raises(AssertionError, match="ICI"):
        multihost.global_mesh(tp=8)


def test_initialize_reads_env_fallback(monkeypatch):
    """JAX_NUM_PROCESSES / JAX_PROCESS_ID env fill in missing args."""
    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "3")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    multihost.initialize(coordinator_address="h:1234")
    assert seen == {"addr": "h:1234", "n": 3, "pid": 2}


# --------------------------------------------------------------------------- #
# 2. Two-process distributed smoke (the sharded eval-stats step)
# --------------------------------------------------------------------------- #

_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]

    from fadtk_tpu.parallel import multihost
    multihost.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    mesh = multihost.global_mesh(tp=2)
    assert mesh.shape == {"dp": 2, "tp": 2}

    # The pipeline's real collective: per-shard Welford partials merged with
    # one psum across dp (metric/stats.welford_merge_across).
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from jax.experimental import multihost_utils
    from fadtk_tpu.metric.stats import (
        welford_finalize, welford_init, welford_merge_across, welford_update,
    )

    n, d = 64, 6
    full = (np.arange(n * d, dtype=np.float32).reshape(n, d) % 17) * 0.25
    local_rows = full.reshape(2, n // 2, d)[pid]  # this process's dp shard
    x = multihost_utils.host_local_array_to_global_array(local_rows, mesh, P("dp"))

    def stats(rows):
        st = welford_update(welford_init(d), rows)
        return welford_finalize(welford_merge_across(st, "dp"))

    mu, cov = jax.jit(
        shard_map(stats, mesh=mesh, in_specs=P("dp"), out_specs=P(),
                  check_vma=False)
    )(x)
    mu = np.asarray(mu.addressable_data(0))
    cov = np.asarray(cov.addressable_data(0))
    np.testing.assert_allclose(mu, full.mean(0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(full, rowvar=False), rtol=1e-5, atol=1e-5)
    print(f"RANK{pid}_OK mu0={mu[0]:.6f}")
    """
)


def test_two_process_distributed_smoke(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            env=_sub_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process smoke timed out")
    for rc, out in outs:
        if rc != 0 and (
            "UNIMPLEMENTED" in out or "not supported" in out.lower()
        ):
            pytest.skip(f"jax.distributed unsupported here: {out[-300:]}")
        assert rc == 0, out[-3000:]
    assert any("RANK0_OK" in out for _, out in outs)
    assert any("RANK1_OK" in out for _, out in outs)


# --------------------------------------------------------------------------- #
# 3. CLI --multihost branch end-to-end (single-process world)
# --------------------------------------------------------------------------- #

_CLI_DRIVER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    td = sys.argv[1]

    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    sr = 16000
    for name, seed in (("a", 5), ("b", 6)):
        d = os.path.join(td, name)
        os.makedirs(d, exist_ok=True)
        r = np.random.default_rng(seed)
        for i in range(2):
            t = np.arange(int(sr * 1.1)) / sr
            x = 0.3 * np.sin(2 * np.pi * r.uniform(200, 1500) * t)
            write_wav_int16(os.path.join(d, f"c{i}.wav"), float_to_int16(x), sr)

    from fadtk_tpu.cli.main import main
    csv = os.path.join(td, "out.csv")
    sys.argv = [
        "fadtk", "vggish", os.path.join(td, "a"), os.path.join(td, "b"), csv,
        "--device-pipeline", "--multihost", "--tp", "2", "--batch", "4",
    ]
    main()
    row = open(csv).read().splitlines()[1].split(",")
    assert row[0] == "vggish" and np.isfinite(float(row[3]))
    print("CLI_MULTIHOST_OK", row[3])
    """
)


def test_cli_multihost_branch(tmp_path):
    """`fadtk ... --device-pipeline --multihost` runs end-to-end: initialize()
    resolves a single-process world from the env fallback, global_mesh spans
    the virtual devices, and the device pipeline scores the datasets."""
    driver = tmp_path / "driver.py"
    driver.write_text(_CLI_DRIVER)
    port = _free_port()
    env = _sub_env(
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="1",
        JAX_PROCESS_ID="0",
        FADTK_TPU_RANDOM_WEIGHTS="1",
    )
    p = subprocess.run(
        [sys.executable, str(driver), str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=240,
    )
    if p.returncode != 0 and "UNIMPLEMENTED" in (p.stdout + p.stderr):
        pytest.skip("jax.distributed unsupported here")
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-3000:]
    assert "CLI_MULTIHOST_OK" in p.stdout
