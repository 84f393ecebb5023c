"""Driver-artifact regression tests (VERDICT r1 items 1 & 10).

Round 1's only red driver artifact was ``MULTICHIP_r01.json``:
``dryrun_multichip`` inherited the axon TPU backend instead of forcing a
virtual CPU mesh.  These tests pin the contract so it cannot regress:

* ``_force_cpu_devices`` must leave the default backend on ``cpu`` with at
  least ``n`` devices, no matter the prior backend state;
* ``dryrun_multichip`` itself must run green end to end (both the explicit
  shard_map+ppermute path and the GSPMD auto path), exactly as the driver
  invokes it.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_force_cpu_devices_pins_platform():
    graft._force_cpu_devices(8)
    assert jax.default_backend() == "cpu"
    assert jax.device_count() >= 8


def test_force_cpu_devices_recovers_initialized_backend():
    # Backends are already initialized in this process (conftest touched
    # devices); the helper must still succeed via the clear-and-reinit path.
    jax.devices()
    graft._force_cpu_devices(8)
    assert jax.default_backend() == "cpu"
    assert jax.device_count() >= 8


@pytest.mark.parametrize("n", [8])
def test_dryrun_multichip_green(n, capsys):
    graft.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert "shard_map+ppermute" in out
    assert "pallas-local" in out
    assert "gspmd-auto" in out
