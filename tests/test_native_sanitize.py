"""ASan/UBSan check of the native core (skipped when g++ unavailable)."""
import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, "pycricodecs_tpu", "native", "sanitize_check.cpp")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_core_sanitizers(tmp_path):
    exe = tmp_path / "cricore_san"
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address,undefined", "-std=c++17",
         SRC, "-o", str(exe), "-lpthread"],
        capture_output=True, timeout=300)
    assert build.returncode == 0, build.stderr.decode()
    run = subprocess.run([str(exe)], capture_output=True, timeout=120)
    assert run.returncode == 0, run.stdout.decode() + run.stderr.decode()
    assert b"all OK" in run.stdout
