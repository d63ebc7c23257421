"""End-to-end integration: one archive flowing through every major
subsystem — build ACB (HCA bank) + ADX + USM (video/subs/alpha), pack all
into a compressed CPK, then extract and batch-decode everything back,
asserting byte parity at each hop."""
import os

import numpy as np
import pytest

import pycricodecs_tpu as pc
from pycricodecs_tpu import parallel
from pycricodecs_tpu.containers.ivf import build_ivf
from pycricodecs_tpu.models import adx as adxmod
from pycricodecs_tpu.models import hca as hcamod
from pycricodecs_tpu.ops import hca_encode_host
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16

KEY = 0xCF222F1FE0748978


def test_full_stack_roundtrip(tmp_path):
    # -- source material -------------------------------------------------
    hca_tracks = []
    for i in range(3):
        wav = write_wav(make_sine_pcm16(8192, 2, 48000, seed=50 + i), 2, 48000)
        hca_tracks.append(hca_encode_host.encode(wav, quality=2))
    adx_wav = write_wav(make_sine_pcm16(4096, 1, 32000, seed=60) // 8,
                        1, 32000)
    adx_blob = adxmod.encode(adx_wav)
    video = build_ivf([b"\x82I\x83B" + bytes(range(200)), b"f" * 333],
                      fps_num=2997, fps_den=100)
    acb_blob = pc.ACBBuilder(hca_tracks, name="bank",
                             cue_names=["a", "b", "c"]).build()
    usm_blob = pc.USMBuilder(video, key=KEY,
                             subtitles=[(0, 900, "hi")]).build()

    # -- pack into a compressed CPK ---------------------------------------
    src = tmp_path / "src"
    src.mkdir()
    (src / "bank.acb").write_bytes(acb_blob)
    (src / "music.adx").write_bytes(adx_blob)
    (src / "movie.usm").write_bytes(usm_blob)
    cpk_path = tmp_path / "all.cpk"
    pc.CPKBuilder(str(src), str(cpk_path), CpkMode=1, compress=True)

    # -- extract the CPK ---------------------------------------------------
    outdir = tmp_path / "out"
    pc.CPK(str(cpk_path)).extract(dirname=str(outdir))
    extracted = {}
    for root, _dirs, files in os.walk(outdir):
        for f in files:
            extracted[f] = open(os.path.join(root, f), "rb").read()
    assert extracted["bank.acb"] == acb_blob
    assert extracted["music.adx"] == adx_blob
    assert extracted["movie.usm"] == usm_blob

    # -- decode the ACB bank in one batch ----------------------------------
    acb = pc.ACB(extracted["bank.acb"])
    assert acb.cue_names() == {0: "a", 1: "b", 2: "c"}
    members = list(acb.awb.getfiles())
    wavs = parallel.decode_batch([bytes(m) for m in members])
    for m, w in zip(members, wavs):
        assert w == hcamod.decode(bytes(m))

    # -- ADX single-file decode --------------------------------------------
    assert adxmod.decode(extracted["music.adx"]) == adxmod.decode(adx_blob)

    # -- USM demux + subtitle recovery --------------------------------------
    usm = pc.USM(extracted["movie.usm"], key=KEY)
    usm.demux()
    assert bytes(usm.output["@SFV_0"]) == video
    assert "hi" in usm.sbt_to_srt(usm.output["@SBT_0"])[0]
