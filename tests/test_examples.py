"""Example scripts: headless smoke runs (quick subset) + reference
parity (every reference example has a counterpart here).

CI runs EVERY example headless (.github/workflows/checks_for_PR.yml,
"examples" job); the in-suite smoke keeps the quick ones from rotting
between CI runs without doubling the suite's wall clock.
"""
import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

# reference examples -> repo counterpart (reference /examples inventory;
# mzm_transfer_function_interactive is covered by the non-interactive
# sweep, ppg3204_loading_ppm_sequence.ipynb by the lab PPG3204 driver
# usage in docs)
REFERENCE_PARITY = {
    "rcos.py": "rcos_pulse_eye.py",
    "ppm_vs_ook_psd_comparison.py": "ppm_vs_ook_psd.py",
    "noise_filtering_comparison.py": "noise_filtering_comparison.py",
    "generalized_mzm_transfer_function.py": "generalized_mzm.py",
    "mzm_transfer_function_interactive.py": "mzm_transfer_function.py",
    "laser_linewidth_demo.py": "laser_linewidth_demo.py",
    "ook_transmission_fiber_simulation.py":
        "ook_transmission_fiber_simulation.py",
}

QUICK = [
    "rcos_pulse_eye.py",
    "ppm_vs_ook_psd.py",
    "noise_filtering_comparison.py",
    "generalized_mzm.py",
    "mzm_transfer_function.py",
]


def test_reference_example_parity():
    for counterpart in REFERENCE_PARITY.values():
        assert os.path.exists(os.path.join(EXAMPLES_DIR, counterpart)), \
            counterpart


@pytest.mark.parametrize("name", QUICK)
def test_example_smoke(name):
    env = dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, name)],
        env=env, capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
