"""Extraction must never write outside the target directory.

Container tables (CPK DirName/FileName, ACB cue names, USM CRID filenames)
are attacker-controlled; the reference joins them into output paths raw
(only drive-letter absolutes are stripped, usm.py:205-220), so a crafted
archive can overwrite arbitrary files. We anchor every archive-supplied
name under the extraction dir (utils/paths.anchored_join) instead.
"""
import os

import numpy as np
import pytest

from pycricodecs_tpu.utils.paths import anchored_join, safe_parts
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16


def _everything_under(root):
    out = []
    for r, _d, files in os.walk(root):
        out += [os.path.join(r, f) for f in files]
    return out


def test_anchored_join_hostile_names():
    assert anchored_join("out", "/etc/passwd") == os.path.join(
        "out", "etc", "passwd")
    assert anchored_join("out", "../../evil") == os.path.join("out", "evil")
    assert anchored_join("out", "..\\..\\evil") == os.path.join("out", "evil")
    assert anchored_join("out", "A:\\win\\abs.bin") == os.path.join(
        "out", "win", "abs.bin")
    assert anchored_join("out", "a/../b") == os.path.join("out", "a", "b")
    assert anchored_join("out", "") == "out"
    assert anchored_join("", "x") == os.path.join(".", "x")
    assert safe_parts("sub/dir/file.bin") == ["sub", "dir", "file.bin"]
    # only a drive-letter prefix is stripped; a POSIX name containing a
    # colon keeps its prefix (colon neutralised, no data loss)
    assert safe_parts("a:b/c.hca") == ["a_b", "c.hca"]
    assert safe_parts("C:/win/x.bin") == ["win", "x.bin"]
    assert safe_parts("weird:name.hca") == ["weird_name.hca"]


def test_cpk_extract_hostile_names(tmp_path):
    from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"payload-a" * 10)
    cpk_path = tmp_path / "t.cpk"
    CPKBuilder(str(src), str(cpk_path), CpkMode=1)
    cpk = CPK(str(cpk_path))
    # a crafted archive: table cells rewritten to traversal names
    cpk.tables["TOC"]["FileName"] = ["../../evil.bin"]
    cpk.tables["TOC"]["DirName"] = [("/",)]  # constant-column tuple form
    out = tmp_path / "out"
    cpk.extract(dirname=str(out))
    written = _everything_under(tmp_path)
    assert all(str(out) in p or "t.cpk" in p or str(src) in p
               for p in written), written
    assert (out / "evil.bin").exists()
    # extract_file takes the same table path
    out2 = tmp_path / "out2"
    cpk.extract_file("../../evil.bin", dirname=str(out2))
    assert (out2 / "evil.bin").exists()


def test_acb_named_extract_hostile_cue_name(tmp_path):
    from pycricodecs_tpu.containers.acb import ACB, ACBBuilder
    from pycricodecs_tpu.ops import hca_encode_host

    wav = write_wav(make_sine_pcm16(4096, 2, 48000, seed=9), 2, 48000)
    hca = hca_encode_host.encode(wav, quality=2)
    # a genuinely hostile file: the builder embeds the cue name verbatim
    blob = ACBBuilder([hca], cue_names=["../../../evil"]).build()
    acb = ACB(blob)
    assert acb.cue_names().get(0) == "../../../evil"
    out = tmp_path / "out"
    acb.extract_with_names(dirname=str(out))
    written = _everything_under(tmp_path)
    assert written and all(str(out) in p for p in written), written


def test_usm_extract_hostile_crid_filename(tmp_path):
    from pycricodecs_tpu.containers.ivf import build_ivf
    from pycricodecs_tpu.containers.usm import USM, USMBuilder

    ivf = build_ivf([b"\x82I\x83B" + b"v" * 200, b"w" * 100])
    usm_bytes = USMBuilder(ivf).build()
    victim = tmp_path / "victim.bin"
    victim.write_bytes(b"precious")
    u = USM(usm_bytes)
    u.demux()

    class EvilCrid:
        def get_payload(self):
            return [
                {"filename": (None, "x.usm")},
                {"filename": (None, str(victim))},      # POSIX absolute
                {"filename": (None, "../../victim.bin")},
            ]

    u.CRIDObj = EvilCrid()
    out = tmp_path / "out"
    u.extract(dirname=str(out))
    assert victim.read_bytes() == b"precious"
    written = _everything_under(tmp_path)
    assert all(str(out) in p or p == str(victim) for p in written), written


def test_usm_builder_writes_basenames(tmp_path):
    from pycricodecs_tpu.containers.ivf import build_ivf
    from pycricodecs_tpu.containers.usm import USM, USMBuilder

    vp = tmp_path / "deep" / "v.ivf"
    vp.parent.mkdir()
    vp.write_bytes(build_ivf([b"\x82I\x83B" + b"v" * 200]))
    ap = tmp_path / "deep" / "a.wav"
    ap.write_bytes(write_wav(make_sine_pcm16(4096, 2, 48000, seed=3),
                             2, 48000))
    u = USM(USMBuilder(str(vp), str(ap), audio_codec="hca").build())
    u.demux()
    names = [r["filename"][1] for r in u.CRIDObj.get_payload()]
    assert all(str(tmp_path) not in n for n in names), names


def test_extract_fallback_names_for_fully_stripped_members(tmp_path):
    """Member names that sanitise to nothing ("..", "/", "C:") must still
    extract under a synthesised name instead of open()ing the directory."""
    from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"payload" * 5)
    cpk_path = tmp_path / "t.cpk"
    CPKBuilder(str(src), str(cpk_path), CpkMode=1)
    cpk = CPK(str(cpk_path))
    cpk.tables["TOC"]["FileName"] = [".."]
    cpk.tables["TOC"]["DirName"] = [("",)]
    out = tmp_path / "out"
    cpk.extract(dirname=str(out))
    assert (out / "member_0").read_bytes() == b"payload" * 5


def test_usm_extract_duplicate_names_dotted_dirname(tmp_path):
    """Duplicate chunk output names must suffix inside the basename even
    when the extraction dir itself contains a dot (an rpartition on the
    whole path wrote a sibling directory outside the anchored root)."""
    from pycricodecs_tpu.containers.ivf import build_ivf
    from pycricodecs_tpu.containers.usm import USM, USMBuilder

    ivf = build_ivf([b"\x82I\x83B" + b"v" * 200])
    u = USM(USMBuilder(ivf).build())
    u.demux()

    class DupCrid:
        def get_payload(self):
            return [{"filename": (None, "x.usm")},
                    {"filename": (None, "track")},
                    {"filename": (None, "track")}]

    u.CRIDObj = DupCrid()
    out = tmp_path / "movie.v2"
    u.extract(dirname=str(out))
    names = sorted(p.name for p in out.iterdir())
    assert names and all((out / n).is_file() for n in names)
    assert not any("v2" in p.name and p != out for p in tmp_path.iterdir()
                   if p.is_dir() and p != out)
