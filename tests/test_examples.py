"""Every example doubles as an integration test (the reference CI
pattern: examples/acados_python/tests, SURVEY.md §4.2)."""
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.parametrize("script", [
    "minimal_example_ocp.py",
    "minimal_example_closed_loop.py",
    "minimal_example_mhe.py",
    "mocp_transition_example.py",
    "differentiable_mpc.py",
    "batched_scenario_mpc.py",
    "batched_rti_phases.py",
    "dae_constrained_ocp.py",
    "on_device_mpc_loop.py",
])
def test_example_runs(script):
    subprocess.run([sys.executable, script], cwd=EXAMPLES, check=True,
                   timeout=540)
