#!/usr/bin/env python3
"""Build the compiled reference oracle at /tmp/refbuild.

Tests and bench_all compare byte-for-byte (and time) against the reference
C extension; /tmp gets wiped between sessions, so this scripts the rebuild.
Four patches are REQUIRED for the oracle to work on this toolchain (each
fixes a latent bug in the reference bindings that otherwise corrupts the
oracle process itself — see CLAUDE.md "Reference oracle"):

1. adx.cpp AdxEncode binding: PyArg "p" writes an int (4 bytes) into a
   `bool force_no_looping` — stack corruption on this ABI.
2. adx.cpp GetADX: `memset(AdxData, 0, HeaderSize)` leaves the block area
   uninitialized while the BitWriter OR-writes into it.
3. crilayla.cpp CriLaylaCompress: "y#" needs Py_ssize_t; layla_comp also
   writes BACKWARD below its dest base and forward past it (header+stream
   copy), so give it below=size+4096 / above=size+8192 slack around an
   offset base pointer.
4. hca.cpp: malloc'd clHCA structs are never zeroed; uninitialized
   ms_stereo nondeterministically rejects dec-chunk v1.x headers. The
   HcaDecode/HcaCrypt bindings (hca.cpp:3302,3356) allocate with a bare
   malloc(sizeof(clHCA)) and never call clHCA_new, so BOTH the bindings
   and clHCA_new need the memset (round-4 only patched clHCA_new — a
   dead call site for the bindings; VERDICT r4 Weak #2).

A post-build self-check decodes a v1.1 dec+ATH header in several fresh
processes (the defect is heap-dependent, i.e. nondeterministic) so a
silently-bad oracle can't adjudicate campaigns.

Usage: python3 tools/build_oracle.py [dest=/tmp/refbuild]
"""
import os
import shutil
import subprocess
import sys

REF = "/root/reference"


def patch(path, old, new, count=1):
    with open(path, "r", encoding="utf-8", errors="surrogateescape") as f:
        src = f.read()
    if old not in src:
        if new in src:
            return  # already applied
        raise SystemExit(f"patch target not found in {path}: {old[:60]!r}")
    src = src.replace(old, new, count)
    with open(path, "w", encoding="utf-8", errors="surrogateescape") as f:
        f.write(src)


def main():
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild"
    # Wipe stale build products: copytree preserves /root/reference's OLD
    # mtimes, so a persisted build/ dir makes setup.py skip recompiling and
    # the .so silently misses new patches (bit us in round 4/5).
    for sub in ("CriCodecs", "build"):
        if os.path.exists(os.path.join(dest, sub)):
            shutil.rmtree(os.path.join(dest, sub))
    if os.path.isdir(dest):
        for f in os.listdir(dest):
            if f.endswith(".so"):
                os.unlink(os.path.join(dest, f))
    os.makedirs(dest, exist_ok=True)
    shutil.copytree(os.path.join(REF, "CriCodecs"),
                    os.path.join(dest, "CriCodecs"))
    shutil.copy(os.path.join(REF, "setup.py"), dest)

    adx = os.path.join(dest, "CriCodecs", "adx.cpp")
    patch(adx, "bool force_no_looping;", "int force_no_looping;")
    patch(adx, "memset(AdxData, 0, HeaderSize);", "memset(AdxData, 0, size);")

    lay = os.path.join(dest, "CriCodecs", "crilayla.cpp")
    patch(lay, "\tunsigned int data_size;\n"
               "    if(!PyArg_ParseTuple(args, \"y#\", &data, &data_size)){",
          "\tPy_ssize_t data_size;\n"
          "    if(!PyArg_ParseTuple(args, \"y#\", &data, &data_size)){")
    patch(lay,
          "    unsigned char *buf = new unsigned char[data_size];\n"
          "    memset(buf, 0, data_size);\n"
          "    layla_comp(buf, &data_size, data, data_size);\n"
          "\tPyObject* bufObj = Py_BuildValue(\"y#\", buf, data_size);\n"
          "    delete[] buf;",
          "    size_t below = (size_t)data_size + 4096;\n"
          "    size_t above = (size_t)data_size + 8192;\n"
          "    unsigned char *buf = new unsigned char[below + above];\n"
          "    memset(buf, 0, below + above);\n"
          "    unsigned int out_size = (unsigned int)data_size;\n"
          "    layla_comp(buf + below, &out_size, data,"
          " (unsigned int)data_size);\n"
          "\tPyObject* bufObj = Py_BuildValue(\"y#\", buf + below,"
          " (Py_ssize_t)out_size);\n"
          "    delete[] buf;")

    hca = os.path.join(dest, "CriCodecs", "hca.cpp")
    patch(hca,
          "    clHCA* hca = (clHCA*)malloc(clHCA_sizeof());\n"
          "    if (hca) {",
          "    clHCA* hca = (clHCA*)malloc(clHCA_sizeof());\n"
          "    if (hca) {\n"
          "        memset(hca, 0, clHCA_sizeof());")
    # The HcaDecode/HcaCrypt bindings never call clHCA_new — they malloc
    # directly (hca.cpp:3302 and :3356), so patch both sites too.
    patch(hca,
          "    clHCA* hca = (clHCA*)malloc(sizeof(clHCA));",
          "    clHCA* hca = (clHCA*)malloc(sizeof(clHCA));\n"
          "    memset(hca, 0, sizeof(clHCA));",
          count=2)

    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=dest, check=True)
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); import CriCodecs; "
         "print('oracle OK:', CriCodecs.__file__)" % dest],
        capture_output=True, text=True, check=True)
    print(out.stdout.strip())
    self_check(dest)


SELF_CHECK = r"""
import sys
dest, repo = sys.argv[1], sys.argv[2]
sys.path.insert(0, dest)
sys.path.insert(0, repo)
import CriCodecs
import numpy as np
from pycricodecs_tpu.utils.wav import write_wav
from pycricodecs_tpu.utils.crc import crc16

rng = np.random.default_rng(91)
t = np.arange(24576) / 48000.0
pcm = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.02 * rng.standard_normal(24576)
pcm = np.clip(pcm * 32767.0, -32768, 32767).astype(np.int16)
wav = write_wav(pcm, 1, 48000)
src = bytes(CriCodecs.HcaEncode(wav, 0, 0))
hs = int.from_bytes(src[6:8], "big")
frame_size = int.from_bytes(src[28:30], "big")
total_band, base_band = src[34], src[35]
out = bytearray(b"HCA\x00" + (0x0101).to_bytes(2, "big") + b"\x00\x00")
out += src[8:24]
out += (b"dec\x00" + frame_size.to_bytes(2, "big") + bytes([1, 15])
        + bytes([total_band - 1, base_band - 1]) + bytes([(1 << 4) | 0])
        + bytes([0]))
out += b"pad\x00"
out[6:8] = (len(out) + 2).to_bytes(2, "big")
out += crc16(bytes(out)).to_bytes(2, "big")
v1 = bytes(out) + src[hs:]
pcm = bytes(CriCodecs.HcaDecode(v1, len(out), 0, 0))
assert len(pcm) > 40000, "v1.1 dec+ATH decode returned %d bytes" % len(pcm)
print("selfcheck OK: v1.1 dec+ATH decode ->", len(pcm), "bytes")
"""


def self_check(dest, runs=5):
    """Decode a v1.1 dec+ATH header in several fresh processes.

    The uninitialized-ms_stereo defect is heap-dependent: a single lucky
    run proves nothing, so repeat in fresh processes (VERDICT r4 #2).
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for i in range(runs):
        r = subprocess.run([sys.executable, "-c", SELF_CHECK, dest, repo],
                           capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            raise SystemExit(
                "oracle self-check FAILED (run %d/%d):\n%s" %
                (i + 1, runs, (r.stderr or r.stdout)[-2000:]))
    print("oracle self-check passed (%d fresh-process runs)" % runs)


if __name__ == "__main__":
    main()
