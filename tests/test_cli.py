"""CLI smoke tests (python -m pycricodecs_tpu ...) through real subprocesses."""
import os
import subprocess
import sys

import numpy as np
import pytest

from pycricodecs_tpu.models import hca as hcamod
from pycricodecs_tpu.ops import hca_encode_host
from pycricodecs_tpu.ops.hca_frame import parse_header
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16

KEY = 0xABCDEF12345


def _run(*args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "pycricodecs_tpu", *args],
                       capture_output=True, text=True, env=env, cwd=cwd,
                       timeout=600)  # cold persistent-cache compiles
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_cli_encode_decode_info_findkey(tmp_path):
    wav = write_wav(make_sine_pcm16(8192, 2, 48000, seed=7), 2, 48000)
    (tmp_path / "in.wav").write_bytes(wav)

    out = _run("encode", "in.wav", "--format", "hca", "--quality", "2",
               cwd=tmp_path)
    assert "in.hca" in out
    blob = (tmp_path / "in.hca").read_bytes()
    assert blob == hca_encode_host.encode(wav, quality=2)

    out = _run("decode", "in.hca", "-o", "out.wav", cwd=tmp_path)
    assert (tmp_path / "out.wav").read_bytes() == hcamod.decode(blob)

    out = _run("info", "in.hca", cwd=tmp_path)
    assert '"HeaderSize"' in out

    hs = parse_header(blob).header_size
    enc = hcamod.crypt(blob, True, hs, 56, KEY)
    (tmp_path / "enc.hca").write_bytes(enc)
    (tmp_path / "cands.txt").write_text("0x1111\n0x%X\n0x2222\n" % KEY)
    out = _run("find-key", "enc.hca", "--candidates", "cands.txt",
               cwd=tmp_path)
    assert "0x00000ABCDEF12345" in out.splitlines()[0]


def test_cli_ahx_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 9000).astype(np.int16)
    (tmp_path / "m.wav").write_bytes(write_wav(pcm, 1, sr))

    out = _run("encode", "m.wav", "--format", "ahx", "--bitrate", "96",
               cwd=tmp_path)
    assert "m.ahx" in out
    blob = (tmp_path / "m.ahx").read_bytes()
    assert blob[:2] == b"\x80\x00" and blob[4] == 0x11

    out = _run("info", "m.ahx", cwd=tmp_path)
    assert '"bitrate": 96000' in out and '"sample_rate": 22050' in out

    out = _run("decode", "m.ahx", "-o", "m_out.wav", cwd=tmp_path)
    dec = (tmp_path / "m_out.wav").read_bytes()
    assert dec[:4] == b"RIFF"
    got = np.frombuffer(dec[0x2C:], dtype="<i2")
    assert len(got) == len(pcm)


def test_cli_build_containers(tmp_path):
    """`build` constructs CPK/AWB/ACB from a directory and USM from IVF+WAV,
    each round-trippable by the extract/bank-decode commands."""
    from pycricodecs_tpu.containers.ivf import build_ivf

    wav = write_wav(make_sine_pcm16(8192, 2, 48000, seed=77), 2, 48000)
    blob = hca_encode_host.encode(wav, quality=2)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.hca").write_bytes(blob)
    (src / "b.hca").write_bytes(blob)

    for ext, extra in (("cpk", ["--compress"]), ("awb", []), ("acb", [])):
        out = tmp_path / f"t.{ext}"
        _run("build", str(src), "-o", str(out), *extra, cwd=tmp_path)
        assert out.stat().st_size > 0

    vp = tmp_path / "v.ivf"
    vp.write_bytes(build_ivf([b"\x82I\x83B" + b"v" * 400, b"w" * 200]))
    ap = tmp_path / "a.wav"
    ap.write_bytes(wav)
    usm = tmp_path / "t.usm"
    _run("build", str(vp), "-o", str(usm), "--audio", str(ap),
         "--codec", "hca", cwd=tmp_path)

    _run("extract", str(tmp_path / "t.cpk"), "-o",
         str(tmp_path / "out_cpk"), cwd=tmp_path)
    assert (tmp_path / "out_cpk" / "a.hca").read_bytes() == blob
    _run("bank-decode", str(tmp_path / "t.acb"), "-o",
         str(tmp_path / "out_acb"), cwd=tmp_path)
    wavs = list((tmp_path / "out_acb").glob("*.wav"))
    assert len(wavs) == 2
    _run("extract", str(usm), "-o", str(tmp_path / "out_usm"),
         "--decode", cwd=tmp_path)
    assert list((tmp_path / "out_usm").glob("*.wav"))
