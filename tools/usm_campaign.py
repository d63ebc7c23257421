"""Randomized differential campaign: USMBuilder (HCA codec) vs the
reference builder, chunk-walk adjudication. Expected divergence class is
exactly the documented reference padding defect (usm.py:927 discards the
ljust result) and its knock-on size fields; anything else is a real break.
Reference builds run in FRESH subprocesses (the reference self-corrupts
in-process; CLAUDE.md adjudication rule)."""
import os, pickle, subprocess, sys, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np

from pycricodecs_tpu.containers.ivf import build_ivf
from pycricodecs_tpu.containers.usm import USM, USMBuilder
from pycricodecs_tpu.utils.wav import write_wav
import test_containers as tc

SEED = 20260818


def fake_ivf(rng):
    nframes = int(rng.integers(3, 40))
    frames = []
    for i in range(nframes):
        body = bytes(rng.integers(0, 256, int(rng.integers(80, 3000)),
                                  dtype=np.uint8))
        frames.append(body)
    fps = [(2997, 100), (30, 1), (24, 1), (5994, 100),
           (25, 1)][int(rng.integers(0, 5))]
    return build_ivf(frames, fps_num=fps[0], fps_den=fps[1]), fps


def sine_wav(rng):
    sr = [16000, 24000, 32000, 44100, 48000][int(rng.integers(0, 5))]
    ch = int(rng.integers(1, 3))
    n = int(sr * rng.uniform(0.2, 2.0))
    t = np.arange(n) / sr
    pcm = np.stack([np.clip(
        np.sin(2 * np.pi * (200 + 120 * c + rng.uniform(0, 50)) * t) * 9000
        + rng.standard_normal(n) * 300, -32768, 32767)
        for c in range(ch)], 1).astype(np.int16)
    return write_wav(pcm.reshape(-1), ch, sr)


def ref_build(ivf_blob, wavs, key):
    code = (
        "import sys, pickle\n"
        "sys.path.insert(0, '/tmp/refbuild')\n"
        "sys.path.insert(0, '/root/reference')\n"
        "import PyCriCodecs\n"
        "ivf, wavs, key = pickle.load(sys.stdin.buffer)\n"
        "kw = dict(audio=wavs, audio_codec='hca') if wavs else {}\n"
        "if key: kw['key'] = key\n"
        "rb = PyCriCodecs.USMBuilder(ivf, **kw)\n"
        "rb.build()\n"
        "sys.stdout.buffer.write(rb.get_usm())\n")
    p = subprocess.run([sys.executable, "-c", code],
                       input=pickle.dumps((ivf_blob, wavs, key)),
                       capture_output=True, timeout=600)
    if p.returncode != 0:
        raise RuntimeError("refcrash: "
                           + p.stderr.decode(errors="replace")[-800:])
    return p.stdout


def adjudicate(ours, ref, n_tracks):
    co = tc._walk_usm_chunks(ours)
    cr = tc._walk_usm_chunks(ref, tolerate_short=True)
    if len(co) != len(cr) or [c[0] for c in co] != [c[0] for c in cr]:
        return f"chunk walk differs: {len(co)} vs {len(cr)}"
    total_short = sum(c[2] for c in cr)
    if n_tracks and total_short == 0:
        return "expected padding defect absent"
    for i, ((_t, a, _s), (tag, r, short)) in enumerate(zip(co, cr)):
        if short:
            if a != r + b"\x00" * short:
                return f"chunk {i} {tag}: short-pad mismatch"
            continue
        if a == r:
            continue
        if a[:0x20] != r[:0x20]:
            return f"chunk {i} {tag}: header mismatch"
        name_a, pa = tc._utf_payload(a)
        name_r, pr = tc._utf_payload(r)
        if name_a != name_r or len(pa) != len(pr):
            return f"chunk {i}: table {name_a} vs {name_r}"
        for row_a, row_r in zip(pa, pr):
            if row_a.keys() != row_r.keys():
                return f"chunk {i} {name_a}: column set differs"
            for k in row_a:
                va, vr = row_a[k][1], row_r[k][1]
                if va == vr:
                    continue
                ok = ((name_a == "CRIUSF_DIR_STREAM" and k == "filesize")
                      or (name_a == "AUDIO_HDRINFO" and k == "metadat_size")
                      or (name_a == "VIDEO_SEEKINFO" and k == "ofs_byte"))
                if not (ok and va - vr in
                        (total_short, total_short // max(n_tracks, 1))):
                    return (f"chunk {i} {name_a}.{k}: {va} vs {vr} "
                            f"(short={total_short})")
    return None


def one_case(i):
    rng = np.random.default_rng([SEED, i])
    ivf_blob, fps = fake_ivf(rng)
    n_tracks = int(rng.integers(0, 3))
    wavs = [sine_wav(rng) for _ in range(n_tracks)]
    key = int(rng.integers(1, 1 << 62)) if rng.random() < 0.4 else 0
    kw = dict(audio=wavs, audio_codec="hca") if wavs else {}
    if key:
        kw["key"] = key
    ours = USMBuilder(ivf_blob, **kw).build()
    try:
        ref = ref_build(ivf_blob, wavs, key)
    except RuntimeError as e:
        # reference crashed: ours must at least demux cleanly
        u = USM(ours, key=key if key else False)
        u.demux()
        return ("refcrash", f"fps={fps} tracks={n_tracks} key={bool(key)} "
                + str(e)[:200])
    bad = adjudicate(ours, ref, n_tracks)
    if bad:
        return ("DIVERGE", f"fps={fps} tracks={n_tracks} key={bool(key)} "
                           f"-> {bad}")
    return ("ok", f"fps={fps} tracks={n_tracks} key={bool(key)}")


n_bad = 0
for i in range(24):
    try:
        verdict, detail = one_case(i)
    except Exception:
        verdict, detail = "ERROR", traceback.format_exc(limit=4)
    print(f"[{i}] {verdict}: {detail}", flush=True)
    n_bad += verdict in ("DIVERGE", "ERROR")
print("DIVERGENCES/ERRORS:", n_bad)
sys.exit(1 if n_bad else 0)
