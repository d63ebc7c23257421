"""The reference README's own usage snippets, run against our package.

Each block below mirrors a code sample from /root/reference/README.md
("Usage:", lines 25-120) with only the import renamed — the concrete proof
that a reference user can switch by changing `PyCriCodecs` to
`pycricodecs_tpu`.
"""
import os

import numpy as np
import pytest

from pycricodecs_tpu import *  # noqa: F401,F403 — the README does this
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16


@pytest.fixture()
def wav_file(tmp_path):
    # quiet enough that the first ADX block's scale stays under 256 — the
    # reference decoder (and ours, for parity) rejects files whose first
    # block scale high byte is nonzero
    pcm = (make_sine_pcm16(8192, 2, 48000, seed=31) // 12).astype(np.int16)
    p = tmp_path / "sample.wav"
    p.write_bytes(write_wav(pcm, 2, 48000))
    return p


def test_readme_adx_snippet(tmp_path, wav_file):
    # Encoding: (README "For ADX decoding and encoding")
    wav_data = open(wav_file, "rb").read()
    adxbytes = ADX.encode(wav_data)  # noqa: F405
    (tmp_path / "f.adx").write_bytes(adxbytes)
    # Decoding:
    adx_data = open(tmp_path / "f.adx", "rb").read()
    wavfilebytes = ADX.decode(adx_data)  # noqa: F405
    assert wavfilebytes[:4] == b"RIFF"


def test_readme_hca_snippet(tmp_path, wav_file):
    # (README "For HCA decoding and encoding")
    wavObj = HCA(str(wav_file))  # noqa: F405
    hcabytes = wavObj.encode(encrypt=True)
    (tmp_path / "f.hca").write_bytes(hcabytes)

    hcaObj = HCA(str(tmp_path / "f.hca"), key=0xCF222F1FE0748978)  # noqa: F405
    wavfile = hcaObj.decode()
    assert wavfile[:4] == b"RIFF"
    hcaObj.decrypt()
    wavObj2 = HCA(hcaObj.get_hca())  # noqa: F405
    wavObj2.encrypt()


def test_readme_cpk_snippet(tmp_path, wav_file, monkeypatch):
    # (README "For CPK extraction and building")
    src = tmp_path / "dirname"
    src.mkdir()
    (src / "a.bin").write_bytes(b"hello" * 100)
    CPKBuilder(str(src), str(tmp_path / "outfile.cpk"), CpkMode=1)  # noqa: F405
    CpkObj = CPK(str(tmp_path / "outfile.cpk"))  # noqa: F405
    monkeypatch.chdir(tmp_path)  # README extracts relative to the CWD
    CpkObj.extract()
    assert (tmp_path / "outfile" / "a.bin").read_bytes() == b"hello" * 100
    CpkObj.extract_file("a.bin")


def test_readme_usm_snippet(tmp_path, wav_file):
    # (README "For USM extraction and Building")
    from pycricodecs_tpu.containers.ivf import build_ivf
    ivf = tmp_path / "filename.ivf"
    ivf.write_bytes(build_ivf([b"\x82I\x83B" + b"v" * 300, b"w" * 200]))

    usmObj = USMBuilder(str(ivf), str(wav_file),  # noqa: F405
                        key=0x1234567890ABCDEF, audio_codec="adx",
                        encryptAudio=True)
    usmObj.build()
    usmbytes = usmObj.get_usm()

    usmObj2 = USM(usmbytes, key="1234567890ABCDEF")  # noqa: F405
    usmObj2.demux()
    assert any(k.startswith("@SFV") for k in usmObj2.output)
    assert any(k.startswith("@SFA") for k in usmObj2.output)
    usmObj2.get_metadata()
    out = tmp_path / "Example"
    usmObj2.extract(dirname=str(out))
    assert list(out.iterdir())


def test_readme_acb_awb_snippet(tmp_path, wav_file, monkeypatch):
    # (README "For ACB or AWB extraction")
    from pycricodecs_tpu.ops import hca_encode_host
    hca_blob = hca_encode_host.encode(open(wav_file, "rb").read(), quality=2)
    builder = ACBBuilder([hca_blob], name="filename",  # noqa: F405
                         embed_awb=False)
    (tmp_path / "filename.acb").write_bytes(builder.build())
    (tmp_path / "filename.awb").write_bytes(builder.awb_blob)

    acbObj = ACB(str(tmp_path / "filename.acb"))  # noqa: F405
    acbObj.extract(dirname=str(tmp_path / "dirname"), decode=True, key=0)
    assert list((tmp_path / "dirname").iterdir())

    awbObj = AWB(str(tmp_path / "filename.awb"))  # noqa: F405
    files = list(awbObj.getfiles())
    assert files == [hca_blob]
    monkeypatch.chdir(tmp_path)
    awbObj.extract()
