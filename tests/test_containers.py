"""Container round-trip and parity tests (AWB, CPK, ACB, USM, IVF)."""
import os
import sys

import numpy as np
import pytest

from pycricodecs_tpu.containers.acb import ACB, ACBBuilder
from pycricodecs_tpu.containers.awb import AWB, AWBBuilder, build_afs2
from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder
from pycricodecs_tpu.containers.ivf import IVF, build_ivf
from pycricodecs_tpu.containers.usm import USM, USMBuilder
from pycricodecs_tpu.containers.utf import UTF, UTFBuilder
from pycricodecs_tpu.utils.wav import write_wav
from tests.conftest import make_sine_pcm16


@pytest.fixture()
def sample_dir(tmp_path):
    rng = np.random.default_rng(3)
    d = tmp_path / "bank"
    d.mkdir()
    for i in range(6):
        blob = (b"payload %d " % i) * (50 * (i + 1))
        (d / f"file_{i:02d}.bin").write_bytes(blob)
    sub = d / "nested"
    sub.mkdir()
    (sub / "deep.dat").write_bytes(bytes(rng.integers(0, 255, 777).astype(np.uint8)))
    return str(d)


# ---------------------------------------------------------------------------
# AWB
# ---------------------------------------------------------------------------

def test_awb_build_matches_reference(oracle_py, sample_dir, tmp_path):
    ours_path = tmp_path / "ours.awb"
    ref_path = tmp_path / "ref.awb"
    AWBBuilder(sample_dir, subkey=0x55, version=2).build(str(ours_path))
    oracle_py.AWBBuilder(sample_dir, subkey=0x55, version=2).build(str(ref_path))
    assert ours_path.read_bytes() == ref_path.read_bytes()


def test_awb_parse_roundtrip(sample_dir, tmp_path):
    from pycricodecs_tpu.containers.awb import build_afs2
    files = sorted(os.path.join(sample_dir, f)
                   for f in os.listdir(sample_dir)
                   if os.path.isfile(os.path.join(sample_dir, f)))
    payloads = [open(p, "rb").read() for p in files]
    blob = build_afs2(payloads, subkey=7)
    awb = AWB(blob)
    assert awb.numfiles == len(files)
    assert awb.subkey == 7
    members = list(awb.getfiles())
    for orig, member in zip(payloads, members):
        assert member[:len(orig)] == orig  # members are tail-padded to align


def test_awb_parse_matches_reference(oracle_py, sample_dir, tmp_path):
    out = tmp_path / "bank.awb"
    AWBBuilder(sample_dir).build(str(out))
    ours = AWB(str(out))
    ref = oracle_py.AWB(str(out))
    assert ours.ids == ref.ids and ours.ofs == ref.ofs
    assert list(ours.getfiles()) == list(ref.getfiles())


# ---------------------------------------------------------------------------
# CPK
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [1, 2, 3])
def test_cpk_build_matches_reference(oracle_py, sample_dir, tmp_path, mode):
    ours_path = tmp_path / "ours.cpk"
    ref_path = tmp_path / "ref.cpk"
    CPKBuilder(sample_dir, str(ours_path), CpkMode=mode)
    oracle_py.CPKBuilder(sample_dir, str(ref_path), CpkMode=mode)
    assert ours_path.read_bytes() == ref_path.read_bytes()


def test_cpk_mode0_build_matches_reference(oracle_py, tmp_path):
    d = tmp_path / "ids"
    d.mkdir()
    rng = np.random.default_rng(5)
    for i in range(5):
        size = 100 + i * 40000  # mix of DataL (<64KB) and DataH entries
        (d / str(i)).write_bytes(bytes(rng.integers(0, 255, size).astype(np.uint8)))
    ours_path = tmp_path / "ours.cpk"
    ref_path = tmp_path / "ref.cpk"
    CPKBuilder(str(d), str(ours_path), CpkMode=0)
    oracle_py.CPKBuilder(str(d), str(ref_path), CpkMode=0)
    assert ours_path.read_bytes() == ref_path.read_bytes()


@pytest.mark.parametrize("encrypt,compress", [(False, False), (True, False),
                                              (False, True)])
def test_cpk_extract_roundtrip(sample_dir, tmp_path, encrypt, compress):
    cpk_path = tmp_path / "arch.cpk"
    CPKBuilder(sample_dir, str(cpk_path), CpkMode=1, encrypt=encrypt,
               compress=compress)
    out_dir = tmp_path / "out"
    cpk = CPK(str(cpk_path))
    cpk.extract(str(out_dir))
    for root, _, names in os.walk(sample_dir):
        for name in names:
            src = os.path.join(root, name)
            rel = os.path.relpath(src, sample_dir)
            dst = out_dir / rel
            assert dst.read_bytes() == open(src, "rb").read(), rel


def test_cpk_extract_file(sample_dir, tmp_path):
    cpk_path = tmp_path / "arch.cpk"
    CPKBuilder(sample_dir, str(cpk_path), CpkMode=1)
    cpk = CPK(str(cpk_path))
    cpk.extract_file("file_03.bin", str(tmp_path / "single"))
    got = (tmp_path / "single" / "file_03.bin").read_bytes()
    assert got == open(os.path.join(sample_dir, "file_03.bin"), "rb").read()


def test_cpk_encrypted_tables_parse(oracle_py, sample_dir, tmp_path):
    cpk_path = tmp_path / "enc.cpk"
    CPKBuilder(sample_dir, str(cpk_path), CpkMode=1, encrypt=True)
    ours = CPK(str(cpk_path))
    ref = oracle_py.CPK(str(cpk_path))
    assert ours.tables["TOC"] == ref.tables["TOC"]


# ---------------------------------------------------------------------------
# ACB
# ---------------------------------------------------------------------------

def _make_hca_tracks(oracle, n=3):
    tracks = []
    for i in range(n):
        pcm = make_sine_pcm16(4096, 2, 48000, seed=100 + i)
        wav = write_wav(pcm, 2, 48000)
        tracks.append(bytes(oracle.HcaEncode(wav, 0, 2)))
    return tracks


def test_acb_build_extract_roundtrip(oracle, tmp_path):
    tracks = _make_hca_tracks(oracle)
    acb_blob = ACBBuilder(tracks, name="testbank").build()
    acb = ACB(acb_blob)
    assert acb.payload[0]["Name"][1] == "testbank"
    members = list(acb.awb.getfiles())
    assert len(members) == len(tracks)
    for member, track in zip(members, tracks):
        assert member[:len(track)] == track
    out = tmp_path / "acb_out"
    acb.extract(decode=True, dirname=str(out))
    assert sorted(os.listdir(out)) == ["0.wav", "1.wav", "2.wav"]
    # decoded output parity against direct decode
    from pycricodecs_tpu.models import hca as hcamod
    assert (out / "0.wav").read_bytes() == hcamod.decode(tracks[0])


def test_acb_named_extract(oracle, tmp_path):
    tracks = _make_hca_tracks(oracle)
    blob = ACBBuilder(tracks, cue_names=["intro", "loop", "outro"]).build()
    acb = ACB(blob)
    assert acb.cue_names() == {0: "intro", 1: "loop", 2: "outro"}
    out = tmp_path / "named"
    acb.extract_with_names(dirname=str(out))
    assert sorted(os.listdir(out)) == ["intro.hca", "loop.hca", "outro.hca"]


def test_acb_parse_matches_reference(oracle, oracle_py, tmp_path):
    tracks = _make_hca_tracks(oracle, 2)
    blob = ACBBuilder(tracks).build()
    ours = ACB(blob)
    ref = oracle_py.ACB(blob)
    assert [bytes(x) for x in ours.awb.getfiles()] == \
        [bytes(x) for x in ref.awb.getfiles()]


# ---------------------------------------------------------------------------
# IVF + USM
# ---------------------------------------------------------------------------

def _fake_ivf(nframes=12):
    rng = np.random.default_rng(11)
    frames = []
    for i in range(nframes):
        body = bytes(rng.integers(0, 255, 400 + 37 * i).astype(np.uint8))
        if i % 6 == 0:
            body = b"\x82I\x83B" + body  # keyframe marker
        frames.append(body)
    return build_ivf(frames, fps_num=2997, fps_den=100)


def test_ivf_parse():
    blob = _fake_ivf()
    ivf = IVF(blob)
    assert ivf.info()["FrameCount"] == 12
    frames = list(ivf.get_frames())
    assert len(frames) == 12
    # reference semantics: the keyframe flag is matched against the 12-byte
    # frame header (ivf.py:57), so well-formed IVF frames never match
    assert all(f[4] is False for f in frames)


@pytest.mark.parametrize("codec", ["adx", "hca"])
def test_usm_build_and_demux(tmp_path, codec):
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(24000, 2, 48000, seed=9)
    wav = write_wav(pcm, 2, 48000)
    builder = USMBuilder(ivf_blob, audio=[wav], audio_codec=codec)
    usm_bytes = builder.build()
    usm = USM(usm_bytes)
    usm.demux()
    assert "@SFV_0" in usm.output and "@SFA_0" in usm.output
    video = bytes(usm.output["@SFV_0"])
    assert video[:len(ivf_blob)] == ivf_blob
    audio = bytes(usm.output["@SFA_0"])
    expected = builder.streams[0] if codec == "adx" \
        else builder.streams[0].get_hca()
    assert audio == bytes(expected)


def test_usm_demux_matches_reference(oracle_py, tmp_path):
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(16000, 1, 32000, seed=10)
    wav = write_wav(pcm, 1, 32000)
    usm_bytes = USMBuilder(ivf_blob, audio=[wav], audio_codec="hca").build()
    path = tmp_path / "video.usm"
    path.write_bytes(usm_bytes)
    ours = USM(str(path))
    ours.demux()
    ref = oracle_py.USM(str(path))
    ref.demux()
    assert {k: bytes(v) for k, v in ours.output.items()} == \
        {k: bytes(v) for k, v in ref.output.items()}


_USM_TAGS = (b"CRID", b"@SFV", b"@SFA", b"@SBT", b"@ALP", b"@CUE",
             b"@USR", b"@PST")


def _walk_usm_chunks(b, tolerate_short=False):
    """Split a USM into (tag, raw_chunk_bytes, short_by) triples.

    With tolerate_short, detects the reference builder's defect (usm.py:927
    discards the bytes.ljust() result): a chunk whose declared size counts
    `padding` bytes that were never written, leaving the next tag `padding`
    bytes early.
    """
    out = []
    off = 0
    while off < len(b):
        tag = b[off:off + 4]
        size = int.from_bytes(b[off + 4:off + 8], "big")
        pad = int.from_bytes(b[off + 10:off + 12], "big")
        end = off + 8 + size
        short = 0
        if (tolerate_short and pad and end + 4 <= len(b)
                and b[end:end + 4] not in _USM_TAGS
                and b[end - pad:end - pad + 4] in _USM_TAGS):
            short = pad
            end -= pad
        out.append((tag, b[off:end], short))
        off = end
    return out


def _utf_payload(chunk_bytes):
    from pycricodecs_tpu.containers.utf import UTF
    t = UTF(chunk_bytes[0x20:])
    return t.table_name, t.get_payload()


def _ref_build_usm(ivf_blob, wav):
    """Build a USM with the reference builder in a FRESH process.

    The reference package corrupts its own in-process state (C-extension
    UB): after a USMBuilder run plus an unrelated ACB parse, subsequent
    reference HCA encodes in the same process return garbage (134MB blobs,
    HeaderSize 0x8040). Oracle results are only trustworthy from an
    isolated process — same adjudication rule as the differential
    campaigns (CLAUDE.md).
    """
    import pickle
    import subprocess
    code = (
        "import sys, pickle\n"
        "sys.path.insert(0, '/tmp/refbuild')\n"
        "sys.path.insert(0, '/root/reference')\n"
        "import PyCriCodecs\n"
        "ivf, wav = pickle.load(sys.stdin.buffer)\n"
        "rb = PyCriCodecs.USMBuilder(ivf, audio=[wav], audio_codec='hca')\n"
        "rb.build()\n"
        "sys.stdout.buffer.write(rb.get_usm())\n")
    p = subprocess.run([sys.executable, "-c", code],
                       input=pickle.dumps((ivf_blob, wav)),
                       capture_output=True, timeout=300)
    assert p.returncode == 0, p.stderr.decode(errors="replace")[-2000:]
    return p.stdout


def test_usm_build_byte_parity_vs_reference(oracle_py):
    """Byte-compare our built USM against the reference builder (HCA codec).

    The two outputs must be byte-identical except for exactly one documented
    reference defect (PARITY.md): reference usm.py:927 discards the
    `chk.ljust()` result, so the AUDIO_HEADER metadata @SFA chunk's declared
    padding is never written — its own demuxer cannot read the file it
    builds. Knock-on field effects in the reference output, all +0x10 in
    ours per audio track: CRID row-0 filesize, AUDIO_HDRINFO metadat_size,
    and every VIDEO_SEEKINFO data offset past the insertion point. Chunk
    order, interleave intervals, framerates, all other UTF fields, and every
    data payload byte must match exactly.
    """
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(24000, 2, 48000, seed=9)
    wav = write_wav(pcm, 2, 48000)
    ours = USMBuilder(ivf_blob, audio=[wav], audio_codec="hca").build()
    ref = _ref_build_usm(ivf_blob, wav)

    co = _walk_usm_chunks(ours)
    cr = _walk_usm_chunks(ref, tolerate_short=True)
    assert len(co) == len(cr)
    assert [c[0] for c in co] == [c[0] for c in cr]
    total_short = sum(c[2] for c in cr)
    assert total_short == 0x10  # one audio track -> one dropped padding run

    n_exceptions = 0
    for i, ((_, a, _), (tag, r, short)) in enumerate(zip(co, cr)):
        if short:
            # ours is the same chunk with the declared padding actually
            # written (header byte-identical, declared sizes already match)
            assert a == r + b"\x00" * short
            n_exceptions += 1
            continue
        if a == r:
            continue
        # a chunk differing beyond the defect must be one of the three
        # knock-on field carriers; headers must still be byte-identical
        assert a[:0x20] == r[:0x20]
        name_a, pa = _utf_payload(a)
        name_r, pr = _utf_payload(r)
        assert name_a == name_r
        assert len(pa) == len(pr)
        for row_a, row_r in zip(pa, pr):
            assert row_a.keys() == row_r.keys()
            for k in row_a:
                va, vr = row_a[k][1], row_r[k][1]
                if va == vr:
                    continue
                if name_a == "CRIUSF_DIR_STREAM":
                    assert k == "filesize" and va == vr + total_short
                elif name_a == "AUDIO_HDRINFO":
                    assert k == "metadat_size" and va == vr + total_short
                elif name_a == "VIDEO_SEEKINFO":
                    assert k == "ofs_byte" and va == vr + total_short
                else:
                    raise AssertionError(
                        f"unexpected divergence in {name_a}.{k}: "
                        f"{va} vs {vr}")
                n_exceptions += 1
    assert n_exceptions >= 3  # padding chunk + filesize + metadat_size


def test_usm_demux_reference_built_file(oracle_py):
    """Our demuxer resyncs over the reference builder's short-written
    AUDIO_HEADER chunks (the reference's own demuxer raises on them) and
    recovers payloads identical to a correctly-built archive's."""
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(16000, 2, 48000, seed=12)
    wav = write_wav(pcm, 2, 48000)
    ref = _ref_build_usm(ivf_blob, wav)
    ours = USMBuilder(ivf_blob, audio=[wav], audio_codec="hca").build()

    u = USM(ref)
    u.demux()
    v = USM(ours)
    v.demux()
    assert sorted(u.output) == sorted(v.output)
    for k in v.output:
        assert bytes(u.output[k]) == bytes(v.output[k])


def test_usm_encrypted_video_roundtrip(oracle_py, tmp_path):
    key = 0x1234567890ABCDEF
    ivf_blob = _fake_ivf()
    usm_bytes = USMBuilder(ivf_blob, key=key).build()
    path = tmp_path / "enc.usm"
    path.write_bytes(usm_bytes)
    ours = USM(str(path), key=key)
    ours.demux()
    assert bytes(ours.output["@SFV_0"])[:len(ivf_blob)] == ivf_blob
    ref = oracle_py.USM(str(path), key=key)
    ref.demux()
    assert {k: bytes(v) for k, v in ours.output.items()} == \
        {k: bytes(v) for k, v in ref.output.items()}


def test_sbt_to_srt():
    from struct import pack
    # two subtitle records, language 0
    recs = b""
    for i, text in enumerate([b"Hello\x00\x00", b"World\x00\x00"]):
        recs += pack("<IIIII", 0, 1000, 1000 * (i + 1), 500, len(text)) + text
    usm = USM.__new__(USM)
    srts = usm.sbt_to_srt(bytearray(recs))
    assert len(srts) == 1
    assert "1\n00:00:01,000 --> 00:00:01,500\nHello" in srts[0]
    assert "2\n00:00:02,000 --> 00:00:02,500\nWorld" in srts[0]


def test_usm_extract_to_files(tmp_path):
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(8000, 1, 32000, seed=12)
    wav = write_wav(pcm, 1, 32000)
    usm_bytes = USMBuilder(ivf_blob, audio=[wav], audio_codec="hca").build()
    path = tmp_path / "movie.usm"
    path.write_bytes(usm_bytes)
    out = tmp_path / "extracted"
    usm = USM(str(path))
    usm.extract(str(out))
    names = sorted(os.listdir(out))
    assert len(names) == 2  # video + one audio track
    meta = usm.get_metadata()
    assert any("CRIUSF_DIR_STREAM" in d for d in meta)


def test_usm_two_audio_tracks(tmp_path):
    ivf_blob = _fake_ivf()
    wav_a = write_wav(make_sine_pcm16(12000, 2, 48000, seed=21), 2, 48000)
    wav_b = write_wav(make_sine_pcm16(12000, 2, 48000, seed=22), 2, 48000)
    builder = USMBuilder(ivf_blob, audio=[wav_a, wav_b], audio_codec="hca")
    usm = USM(builder.build())
    usm.demux()
    assert "@SFA_0" in usm.output and "@SFA_1" in usm.output
    assert bytes(usm.output["@SFA_0"]) == builder.streams[0].get_hca()
    assert bytes(usm.output["@SFA_1"]) == builder.streams[1].get_hca()


def test_cpk_itoc_extract_file(tmp_path):
    d = tmp_path / "ids"
    d.mkdir()
    rng = np.random.default_rng(8)
    payloads = {}
    for i in range(4):
        blob = bytes(rng.integers(0, 255, 600 + 900 * i).astype(np.uint8))
        (d / str(i)).write_bytes(blob)
        payloads[i] = blob
    cpk_path = tmp_path / "ids.cpk"
    CPKBuilder(str(d), str(cpk_path), CpkMode=0)
    cpk = CPK(str(cpk_path))
    cpk.extract_file(2, str(tmp_path / "one"))
    assert (tmp_path / "one" / "2").read_bytes() == payloads[2]
    out = tmp_path / "all"
    cpk.extract(str(out))
    for i, blob in payloads.items():
        assert (out / str(i)).read_bytes() == blob


def test_acb_with_sibling_awb(oracle, tmp_path):
    from pycricodecs_tpu.containers.awb import build_afs2
    from pycricodecs_tpu.containers.chunk import UTFTypeValues as TV
    from pycricodecs_tpu.containers.utf import UTFBuilder
    tracks = _make_hca_tracks(oracle, 2)
    (tmp_path / "bank.awb").write_bytes(build_afs2(tracks))
    header = [{
        "Name": (TV.string, "bank"),
        "AwbFile": (TV.bytes, b""),
        "WaveformTable": (TV.bytes, bytes(UTFBuilder([
            {"MemoryAwbId": (TV.ushort, i), "EncodeType": (TV.uchar, 2),
             "Streaming": (TV.uchar, 0)} for i in range(2)],
            table_name="Waveform").parse())),
    }]
    acb_path = tmp_path / "bank.acb"
    acb_path.write_bytes(bytes(UTFBuilder(header, table_name="Header").parse()))
    acb = ACB(str(acb_path))
    members = list(acb.awb.getfiles())
    assert len(members) == 2
    assert members[0][:len(tracks[0])] == tracks[0]


def test_usm_encrypted_adx_audio_roundtrip(oracle_py, tmp_path):
    key = 0xFEDCBA9876543210
    ivf_blob = _fake_ivf()
    wav = write_wav(make_sine_pcm16(16000, 2, 32000, seed=31), 2, 32000)
    usm_bytes = USMBuilder(ivf_blob, audio=[wav], key=key,
                           audio_codec="adx", encryptAudio=True).build()
    path = tmp_path / "enc_adx.usm"
    path.write_bytes(usm_bytes)
    ours = USM(str(path), key=key)
    ours.demux()
    audio = bytes(ours.output["@SFA_0"])
    assert audio[:2] == b"\x80\x00"  # decrypted ADX header
    ref = oracle_py.USM(str(path), key=key)
    ref.demux()
    assert {k: bytes(v) for k, v in ours.output.items()} == \
        {k: bytes(v) for k, v in ref.output.items()}
    # decrypted audio decodes
    from pycricodecs_tpu.models import adx as adxmod
    from pycricodecs_tpu.models.adx import parse_adx_header
    parse_adx_header(audio, strict_cri_check=False)


def test_usm_builder_subtitles_and_alpha():
    """Beyond-reference: @SBT subtitle and @ALP alpha-video streams build,
    demux back byte-exactly (alpha under the video mask), and SBT converts
    to per-language SRT."""
    video = _fake_ivf(6)
    alpha = build_ivf([b"\x82I\x83B" + b"a" * 100, b"b" * 80, b"c" * 60],
                      fps_num=2997, fps_den=100)
    subs = {0: [(0, 1500, "Hello world"), (2000, 1000, "Second line")],
            1: [(0, 1500, "Bonjour le monde")]}
    key = 0x1234ABCD5678
    blob = USMBuilder(video, key=key, subtitles=subs, alpha=alpha).build()
    usm = USM(blob, key=key)
    usm.demux()
    assert bytes(usm.output["@SFV_0"]) == video
    assert bytes(usm.output["@ALP_0"]) == alpha
    srts = usm.sbt_to_srt(usm.output["@SBT_0"])
    assert len(srts) == 2
    assert "00:00:00,000 --> 00:00:01,500" in srts[0]
    assert "Second line" in srts[0]
    assert "Bonjour le monde" in srts[1]


@pytest.mark.parametrize("codec", ["adx", "hca"])
def test_usm_extract_decode_audio(tmp_path, codec):
    ivf_blob = _fake_ivf()
    pcm = make_sine_pcm16(8000, 1, 32000, seed=13)
    wav = write_wav(pcm, 1, 32000)
    usm_bytes = USMBuilder(ivf_blob, audio=[wav], audio_codec=codec).build()
    path = tmp_path / "movie.usm"
    path.write_bytes(usm_bytes)
    out = tmp_path / "dec"
    USM(str(path)).extract(str(out), decode=True)
    names = sorted(os.listdir(out))
    wavs = [n for n in names if n.endswith(".wav")]
    assert len(wavs) == 1
    blob = (out / wavs[0]).read_bytes()
    assert blob[:4] == b"RIFF"
    # the decoded track plays back the encoded audio (ADX is lossy-exactish,
    # HCA is perceptual -- just require same length scale and correlation)
    got = np.frombuffer(blob[0x2C:], dtype="<i2").astype(np.float64)
    assert got.size >= pcm.size


def test_usm_decode_audio_sniffer():
    from pycricodecs_tpu.models.ahx import AHX
    from pycricodecs_tpu.models import adx as adxmod

    pcm = make_sine_pcm16(22050, 1, 22050, seed=14)
    ahx_blob = AHX.encode(write_wav(pcm, 1, 22050), bitrate_kbps=96)
    wav = USM._decode_audio(ahx_blob)
    assert wav is not None and wav[:4] == b"RIFF"
    assert np.frombuffer(wav[0x2C:], dtype="<i2").size == pcm.size

    adx_blob = adxmod.encode(write_wav(pcm, 1, 22050))
    assert USM._decode_audio(adx_blob)[:4] == b"RIFF"
    assert USM._decode_audio(b"\x00" * 64) is None        # not audio
    assert USM._decode_audio(b"\x80\x00\xff") is None     # truncated


def test_usm_decode_audio_hca_subkey():
    from pycricodecs_tpu.models import hca as hcamod
    from pycricodecs_tpu.ops import hca_encode_host
    from pycricodecs_tpu.ops.hca_frame import parse_header as hca_parse

    wav = write_wav(make_sine_pcm16(8192, 2, 48000, seed=15), 2, 48000)
    plain = hca_encode_host.encode(wav, quality=2)
    key, subkey = 0xCF222F1FE0748978, 0xBEEF
    hs = hca_parse(plain).header_size
    enc = hcamod.crypt(plain, True, hs, 56, key, subkey)
    wav_out = USM._decode_audio(enc, key=key, subkey=subkey)
    assert wav_out is not None and wav_out[:4] == b"RIFF"
    assert wav_out == hcamod.decode(enc, key=key, subkey=subkey)
    # wrong subkey -> clean None (extract warns and writes raw)
    assert USM._decode_audio(enc, key=key, subkey=0x1234) is None


def test_usm_extract_handles_unlisted_chunks(tmp_path):
    """Data chunks beyond the CRID-listed streams (e.g. @USR) must not crash
    extract; they get named after the chunk instead."""
    from pycricodecs_tpu.containers.chunk import USMChunkHeader

    ivf_blob = _fake_ivf()
    usm_bytes = bytearray(USMBuilder(ivf_blob).build())
    payload = b"user data"
    # chunksize counts from byte 8 (header remainder 0x18 + payload)
    usm_bytes += USMChunkHeader.pack(b"@USR", 0x18 + len(payload), 0, 0x18,
                                     0, 0, 0, 0, 0, 0, 0, 0, 0) + payload
    path = tmp_path / "extra.usm"
    path.write_bytes(bytes(usm_bytes))
    out = tmp_path / "x"
    USM(str(path)).extract(str(out), decode=True)
    names = sorted(os.listdir(out))
    assert any(n.startswith("@USR") and n.endswith(".bin") for n in names)


def test_usm_extract_decode_no_wav_collision(tmp_path):
    """Two audio tracks decode to distinct .wav files (stems collide)."""
    ivf_blob = _fake_ivf()
    wav_a = write_wav(make_sine_pcm16(12000, 2, 48000, seed=31), 2, 48000)
    wav_b = write_wav(make_sine_pcm16(12000, 2, 48000, seed=32), 2, 48000)
    usm_bytes = USMBuilder(ivf_blob, audio=[wav_a, wav_b],
                           audio_codec="hca").build()
    path = tmp_path / "two.usm"
    path.write_bytes(usm_bytes)
    out = tmp_path / "y"
    USM(str(path)).extract(str(out), decode=True)
    wavs = [n for n in sorted(os.listdir(out)) if n.endswith(".wav")]
    assert len(wavs) == 2, wavs
    payloads = {(out / n).read_bytes() for n in wavs}
    assert len(payloads) == 2


def test_awb_getfile_atindex_returns_correct_member():
    """The reference seeks past the member and returns the NEXT one's bytes
    (empty for the last) — fixed. Members carry alignment padding, matching
    getfiles()."""
    blobs = [b"A" * 100, b"B" * 333, b"C" * 57]
    awb = AWB(build_afs2(blobs))
    members = list(awb.getfiles())
    for i, blob in enumerate(blobs):
        got = awb.getfile_atindex(i)
        assert got == members[i], i
        assert got.startswith(blob) and not any(got[len(blob):]), i


def test_cpk_subdir_containing_root_name(tmp_path):
    """DirName must survive subpaths repeating the root directory's name
    (the reference's split() corrupts them)."""
    root = tmp_path / "snd"
    (root / "sndfx").mkdir(parents=True)
    (root / "sndfx" / "a.bin").write_bytes(b"\x01" * 600)
    (root / "b.bin").write_bytes(b"\x02" * 300)
    out = tmp_path / "t.cpk"
    CPKBuilder(str(root), str(out), CpkMode=1)
    cpk = CPK(str(out))
    toc = cpk.tables["TOC"]
    pairs = {(cpk._cell(toc["DirName"], i), cpk._cell(toc["FileName"], i))
             for i in range(len(toc["FileName"]))}
    assert ("sndfx", "a.bin") in pairs and ("", "b.bin") in pairs
    cpk.extract_file("a.bin", dirname=str(tmp_path / "x"))
    assert (tmp_path / "x" / "sndfx" / "a.bin").read_bytes() == b"\x01" * 600


def test_cpk_toc_estimate_shared_string_dedup(tmp_path):
    """A directory and file sharing a name dedup in the UTF string pool;
    the size pre-estimate must agree (the reference's disjoint dir/file
    sets over-count and trip the build assert)."""
    root = tmp_path / "r"
    (root / "foo").mkdir(parents=True)
    (root / "foo" / "foo").write_bytes(b"\x03" * 500)   # dir and file: "foo"
    (root / "foo" / "ID").write_bytes(b"\x04" * 200)    # column-key collision
    out = tmp_path / "dedup.cpk"
    CPKBuilder(str(root), str(out), CpkMode=1)          # asserts internally
    cpk = CPK(str(out))
    cpk.extract_file("foo", dirname=str(tmp_path / "y"))
    assert (tmp_path / "y" / "foo" / "foo").read_bytes() == b"\x03" * 500


def test_cpk_constant_storage_header_columns(tmp_path, oracle_py):
    """_check_tocs must normalise constant-storage header cells (0x30/0x70
    columns keep raw tuples in the columnar table)."""
    root = tmp_path / "c"
    root.mkdir()
    (root / "one.bin").write_bytes(b"\x05" * 128)
    out = tmp_path / "c.cpk"
    CPKBuilder(str(root), str(out), CpkMode=1)
    cpk = CPK(str(out))
    # single-row header tables always use per-row storage, so synthesise
    # what a constant-storage (0x30/0x70) parse produces: raw unpack tuples
    # in the columnar table (utf.py keeps them for quirk parity)
    for key in ("TocOffset", "TocSize", "ContentOffset", "Align"):
        cell = cpk.tables["CPK"].get(key)
        if cell and not isinstance(cell[0], tuple):
            cpk.tables["CPK"][key] = [(cell[0],)]
    cpk.tables.pop("TOC", None)
    cpk._check_tocs()                       # must normalise, not TypeError
    assert "TOC" in cpk.tables
    cpk.extract_file("one.bin", dirname=str(tmp_path / "z"))
    assert (tmp_path / "z" / "one.bin").read_bytes() == b"\x05" * 128


def test_utf_builder_null_mixed_string_column():
    """A varying string column mixing '<NULL>' (pool offset 0) with real
    values serialises and round-trips."""
    from pycricodecs_tpu.containers.chunk import UTFTypeValues as TV

    payload = [{"A": (TV.string, "<NULL>"), "N": (TV.uint, 0)},
               {"A": (TV.string, "x"), "N": (TV.uint, 1)}]
    blob = bytes(UTFBuilder(payload, table_name="NB").parse())
    got = UTF(blob).get_payload()
    assert got[0]["A"][1] == "<NULL>" and got[1]["A"][1] == "x"


def test_acb_synth_reference_cycle_terminates():
    """A 2-node ReferenceItems cycle must not recurse forever."""
    from struct import pack as _pack
    from pycricodecs_tpu.containers.acb import ACB
    from pycricodecs_tpu.containers.chunk import UTFTypeValues as TV

    synth = [{"ReferenceItems": (TV.bytes, _pack(">HH", 2, 1))},
             {"ReferenceItems": (TV.bytes, _pack(">HH", 2, 0))}]
    acb = ACB.__new__(ACB)
    acb.payload = [{
        "SynthTable": synth,
        "CueNameTable": [{"CueName": (TV.string, "c"),
                          "CueIndex": (TV.ushort, 0)}],
        "CueTable": [{"ReferenceType": (TV.uchar, 2),
                      "ReferenceIndex": (TV.ushort, 0)}],
        "WaveformTable": [],
    }]
    acb.awb = None
    names = acb.cue_names()      # must terminate
    assert isinstance(names, dict)


def test_usm_append_stream_keeps_filenames(tmp_path):
    """append_stream must preserve earlier tracks' CRID filenames (it used
    to reset audio_filenames to only the new track and crash build())."""
    ivf_blob = _fake_ivf()
    wav_a = write_wav(make_sine_pcm16(8000, 1, 32000, seed=61), 1, 32000)
    wav_b = write_wav(make_sine_pcm16(8000, 1, 32000, seed=62), 1, 32000)
    b = USMBuilder(ivf_blob, audio=[wav_a], audio_codec="hca")
    b.append_stream(wav_b)
    usm = USM(b.build())
    usm.demux()
    assert "@SFA_0" in usm.output and "@SFA_1" in usm.output
    meta = usm.get_metadata()
    crid = next(iter(meta[0].values()))
    names = [row["filename"][1] for row in crid[1:]]
    assert len(names) == len(set(names)) == 3  # video + 2 distinct tracks


def test_usm_alpha_longer_than_video(tmp_path):
    """@ALP streams longer than the main video must flush completely."""
    short = _fake_ivf(nframes=4)
    long_alpha = _fake_ivf(nframes=9)
    blob = USMBuilder(short, alpha=long_alpha).build()
    usm = USM(blob)
    usm.demux()
    alp = bytes(usm.output["@ALP_0"])
    ref = bytes(usm.output["@SFV_0"])
    assert len(IVF(alp).info()) and alp[:4] == b"DKIF"
    from pycricodecs_tpu.containers.ivf import IVF as _IVF
    assert len(list(_IVF(alp).get_frames())) == 9
    assert len(list(_IVF(ref).get_frames())) == 4
    # header filesize accounts for the alpha payload: the gap to the true
    # size equals the plain build's constant 0x40 parity quirk (the
    # reference's total_len formula, usm.py:994-1002)
    crid = next(iter(usm.get_metadata()[0].values()))
    plain = USMBuilder(_fake_ivf(nframes=4)).build()
    u2 = USM(plain)
    u2.demux()
    plain_gap = len(plain) - \
        next(iter(u2.get_metadata()[0].values()))[0]["filesize"][1]
    assert len(blob) - crid[0]["filesize"][1] == plain_gap


def test_usm_builder_rejects_sub_960hz_adx():
    ivf_blob = _fake_ivf()
    wav = write_wav(make_sine_pcm16(2048, 1, 800, seed=63), 1, 800)
    with pytest.raises(ValueError):
        USMBuilder(ivf_blob, audio=[wav], audio_codec="adx").build()


def test_acb_external_sibling_awb(tmp_path, oracle):
    """An ACB without an embedded AwbFile resolves `<Name>.awb` next to it
    (reference acb.py:33-43); extraction and bank decode work through the
    sibling file."""
    from pycricodecs_tpu.containers.acb import ACB, ACBBuilder
    from pycricodecs_tpu import parallel

    wav = write_wav(make_sine_pcm16(4096, 2, 48000, seed=55), 2, 48000)
    hca_blob = bytes(oracle.HcaEncode(wav, 0, 2))
    builder = ACBBuilder([hca_blob, hca_blob], name="bank", embed_awb=False)
    acb_bytes = builder.build()
    acb_path = tmp_path / "bank.acb"
    acb_path.write_bytes(acb_bytes)
    (tmp_path / "bank.awb").write_bytes(builder.awb_blob)

    acb = ACB(str(acb_path))
    members = list(acb.awb.getfiles())
    assert members == [hca_blob, hca_blob]
    out = tmp_path / "out"
    acb.extract(decode=True, dirname=str(out))
    assert sorted(p.name for p in out.iterdir()) == ["0.wav", "1.wav"]
    wavs = parallel.decode_acb(acb)
    assert len(wavs) == 2 and wavs[0] == wavs[1]


def test_cpk_duplicate_filenames_do_not_overwrite(tmp_path):
    """Duplicate member names must not lose data (the reference's extract
    overwrites them — README.md:134; not reproduced)."""
    from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder

    src = tmp_path / "src"
    src.mkdir()
    (src / "x.bin").write_bytes(b"AAAA" * 50)
    cp = tmp_path / "t.cpk"
    CPKBuilder(str(src), str(cp), CpkMode=1)
    cpk = CPK(str(cp))
    toc = cpk.tables["TOC"]
    toc["FileName"] = ["dup.bin", "dup.bin"]
    toc["DirName"] = [("",)]
    out = tmp_path / "out"
    cpk.extract(dirname=str(out))
    names = sorted(p.name for p in out.iterdir())
    assert names == ["dup.bin", "dup_1.bin"]


def test_cpk_duplicate_names_with_dotted_base_stay_anchored(
        tmp_path, monkeypatch):
    """The duplicate suffix must split inside the basename: with a dotted
    archive name ('archive.v2') and extensionless duplicate members, an
    rpartition on the whole path would write a sibling directory OUTSIDE
    the extraction root."""
    from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder

    src = tmp_path / "src"
    src.mkdir()
    (src / "x.bin").write_bytes(b"Z" * 64)
    cp = tmp_path / "archive.v2.cpk"
    CPKBuilder(str(src), str(cp), CpkMode=1)
    cpk = CPK(str(cp))
    toc = cpk.tables["TOC"]
    toc["FileName"] = ["track", "track"]
    toc["DirName"] = [("sound",)]
    monkeypatch.chdir(tmp_path)
    cpk.extract()  # no dirname: base = 'archive.v2' (dotted)
    base = tmp_path / "archive.v2"
    assert sorted(p.name for p in (base / "sound").iterdir()) \
        == ["track", "track_1"]
    assert not (tmp_path / "archive_1.v2").exists()
