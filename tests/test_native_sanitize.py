"""ASan/UBSan check of the native core (skipped when g++ unavailable)."""
import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, "pycricodecs_tpu", "native", "sanitize_check.cpp")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
@pytest.mark.parametrize("arch", ["generic", "native"])
def test_native_core_sanitizers(tmp_path, arch):
    """Both code paths must be sanitizer-clean: the portable scalar build
    and the -march=native build whose __AVX2__ twins (IMDCT/OLA, MDCT,
    band costs, scalefactor search, quantiser) otherwise never compile."""
    exe = tmp_path / f"cricore_san_{arch}"
    cmd = ["g++", "-O1", "-g", "-fsanitize=address,undefined",
           "-ffp-contract=off", "-std=c++17", SRC, "-o", str(exe),
           "-lpthread"]
    if arch == "native":
        cmd.insert(1, "-march=native")
    build = subprocess.run(cmd, capture_output=True, timeout=300)
    assert build.returncode == 0, build.stderr.decode()
    run = subprocess.run([str(exe)], capture_output=True, timeout=120)
    assert run.returncode == 0, run.stdout.decode() + run.stderr.decode()
    assert b"all OK" in run.stdout
