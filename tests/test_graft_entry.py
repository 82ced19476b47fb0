"""Driver-contract tests for __graft_entry__ — the round-1 failure mode.

The driver imports __graft_entry__ in a fresh process under the container's
default env (sitecustomize pins JAX_PLATFORMS=axon) and calls
``dryrun_multichip(8)``; round 1 crashed because nothing forced a virtual
8-device CPU mesh (reference analog: configs/trainer/ddp_sim.yaml:1-8).
These tests run the contract exactly as the driver does.
"""

import os
import re
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_cpu_mesh_ready_under_test_env():
    # conftest already forced an 8-device CPU backend; the helper must agree.
    assert graft._cpu_mesh_ready(8)
    assert len(jax.devices()) >= 8


def test_subprocess_env_rewrites_device_count():
    os.environ.setdefault("XLA_FLAGS", "")
    env = graft._subprocess_env(5)
    assert "--xla_force_host_platform_device_count=5" in env["XLA_FLAGS"]
    assert len(re.findall(r"xla_force_host_platform_device_count", env["XLA_FLAGS"])) == 1
    assert env["EMOJIVOICE_DRYRUN_SUBPROC"] == "1"


def test_entry_traces():
    # eval_shape = full trace of the fused flagship synthesise program
    # (catches shape/dtype breaks) without paying XLA compile time.
    fn, args = graft.entry()
    mel, lengths = jax.eval_shape(fn, *args)
    assert mel.shape == (1, 256, 80)
    assert lengths.shape == (1,)


@pytest.mark.slow
def test_dryrun_multichip_driver_replica():
    """Fresh subprocess, driver-default env (no virtual-device flags, no
    JAX_PLATFORMS=cpu) — dryrun_multichip(8) must force the mesh itself."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    env.pop("EMOJIVOICE_DRYRUN_SUBPROC", None)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "step ok" in proc.stdout
    assert "devices=8" in proc.stdout
    # n=8 → 2-D (4 data × 2 model) mesh: DP + tensor parallelism exercised
    assert "'data': 4" in proc.stdout and "'model': 2" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_inproc():
    # Under the pytest CPU mesh the in-process path runs directly.
    graft.dryrun_multichip(8)
