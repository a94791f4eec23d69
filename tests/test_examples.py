"""The quickstart example must run end to end."""

import subprocess
import sys


def test_quickstart_runs(tmp_path):
    proc = subprocess.run(
        [sys.executable, "examples/quickstart.py", "--workdir", str(tmp_path),
         "--train-steps", "2"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": "."},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "QUICKSTART COMPLETE" in proc.stdout


def test_filtered_search_example_runs():
    proc = subprocess.run(
        [sys.executable, "examples/filtered_search.py"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": "."},
        cwd=".",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[4] shim filtered search" in proc.stdout


def test_serving_example_runs(tmp_path):
    proc = subprocess.run(
        [sys.executable, "examples/serving.py"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": "."},
        cwd=".",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[5] deleted" in proc.stdout
