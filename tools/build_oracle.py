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
4. hca.cpp clHCA_new: malloc'd clHCA is never zeroed; uninitialized
   ms_stereo nondeterministically rejects dec-chunk v1.x headers.

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
    if os.path.exists(os.path.join(dest, "CriCodecs")):
        shutil.rmtree(os.path.join(dest, "CriCodecs"))
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

    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=dest, check=True)
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); import CriCodecs; "
         "print('oracle OK:', CriCodecs.__file__)" % dest],
        capture_output=True, text=True, check=True)
    print(out.stdout.strip())


if __name__ == "__main__":
    main()
