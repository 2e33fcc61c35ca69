"""Example smoke tests (scaled-down configs so CI stays fast)."""

import subprocess
import sys

import pytest

REPO = __file__.rsplit("/", 2)[0]

# full example subprocesses: minutes each (slow tier)
pytestmark = pytest.mark.slow


def run_example(name, *args, timeout=600):
    out = subprocess.run(
        [sys.executable, f"{REPO}/examples/{name}", "--cpu", *args],
        capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, f"{name} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_lotka_volterra_example():
    out = run_example("lotka_volterra.py", "--steps", "20")
    assert "solves converged: 10/10" in out


def test_cartpole_example():
    out = run_example("cartpole.py", "--steps", "12")
    assert "kkt backend: riccati" in out


def test_quadrotor_example():
    out = run_example("quadrotor.py", "--batch", "16", "--H", "20")
    assert "converged 16/16" in out


def test_fleet_rnn_example():
    out = run_example("fleet_rnn.py", "--batch", "16", "--H", "16",
                      "--steps", "1")
    assert "kkt=riccati" in out
    assert "converged 16/16" in out
