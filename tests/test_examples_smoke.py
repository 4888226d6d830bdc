"""Example scripts stay runnable (subprocess smoke with tiny budgets;
the reference runs its tutorials in CI the same way)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("examples/densitycurrent.py",
     ["--timeend", "5", "--resolution", "400", "--platform", "cpu"]),
    ("examples/agnesi_mountain.py",
     ["--nel", "4", "1", "3", "--poly", "3", "--timeend", "10",
      "--platform", "cpu"]),
    ("examples/baroclinic_wave.py",
     ["--n-horz", "2", "--n-vert", "2", "--poly", "3", "--timeend", "30",
      "--platform", "cpu"]),
    ("examples/solid_body_rotation.py",
     ["--n-horz", "3", "--n-vert", "3", "--poly", "3", "--timeend", "300",
      "--platform", "cpu"]),
    ("examples/stable_bl_les.py",
     ["--timeend", "10", "--platform", "cpu"]),
    ("examples/convective_bl_les.py",
     ["--timeend", "10", "--domain", "800", "800", "800",
      "--resolution", "100", "100", "100", "--platform", "cpu"]),
    ("examples/surfacebubble.py",
     ["--timeend", "10", "--domain", "800", "800", "800",
      "--resolution", "100", "100", "100", "--platform", "cpu"]),
    ("examples/rising_bubble_theta.py",
     ["--timeend", "10", "--domain", "1000", "1000", "1000",
      "--resolution", "125", "125", "125", "--platform", "cpu"]),
    ("examples/ocean_split_explicit_box.py",
     ["--hours", "1.5", "--nx", "3", "--nz", "3", "--platform", "cpu"]),
    ("examples/richards_soil_water.py",
     ["--hours", "0.02", "--equilibrium-steps", "10", "--platform", "cpu"]),
    ("examples/risingbubble_fvm.py",
     ["--timeend", "10", "--dh", "500", "--dv", "500", "--platform", "cpu"]),
    ("examples/solid_body_rotation_fvm.py",
     ["--n-horz", "2", "--n-vert", "10", "--poly", "3", "--timeend", "120",
      "--platform", "cpu"]),
    ("examples/cfsite_amip.py",
     ["--timeend", "10", "--domain", "600", "600", "1200",
      "--resolution", "150", "150", "150", "--poly", "3",
      "--platform", "cpu"]),
]


@pytest.mark.parametrize("script,args", CASES,
                         ids=[c[0].split("/")[-1] for c in CASES])
def test_example_runs(script, args):
    r = subprocess.run([sys.executable, script] + args, cwd=ROOT,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "finite: True" in r.stdout or "max" in r.stdout, r.stdout[-500:]


def test_schar_example_runs():
    r = subprocess.run(
        [sys.executable, "examples/schar_scalar_advection.py",
         "--nel", "6", "1", "5", "--poly", "3", "--timeend", "20",
         "--platform", "cpu"],
        cwd=ROOT, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "finite: True" in r.stdout


def test_burgers_single_stack_example_runs():
    r = subprocess.run(
        [sys.executable, "examples/burgers_single_stack.py",
         "--nelem", "6", "--poly", "3", "--timeend", "0.05",
         "--platform", "cpu"],
        cwd=ROOT, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "finite: True" in r.stdout
