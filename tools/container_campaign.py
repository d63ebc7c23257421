"""Randomized differential campaign: CPK/AWB builders vs the reference
Python package (byte-compare), random trees/names/sizes/modes/subkeys.
Compress-mode CPK is excluded from byte-parity (documented reference
defect: FileSize/ExtractSize swap we deliberately fix)."""
import os, shutil, sys, tempfile, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import numpy as np

from pycricodecs_tpu.containers.awb import AWBBuilder
from pycricodecs_tpu.containers.cpk import CPK, CPKBuilder
import PyCriCodecs as ref

SEED = 20260818
NAME_CHARS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-. "


def rand_name(rng, depth_ok=True):
    n = int(rng.integers(1, 24))
    s = "".join(NAME_CHARS[i] for i in rng.integers(0, len(NAME_CHARS), n))
    s = s.strip(" .") or "f"
    if depth_ok and rng.random() < 0.3:
        return rand_name(rng, False) + "/" + s
    return s


def make_tree(rng, root, mode):
    nf = int(rng.integers(1, 18))
    names = set()
    for i in range(nf):
        if mode == 0:
            name = str(i)                      # ITOC by integer id
        else:
            name = rand_name(rng)
            while name.lower() in names:
                name = rand_name(rng)
            names.add(name.lower())
        p = os.path.join(root, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        kind = rng.integers(0, 4)
        if kind == 0:
            size = int(rng.integers(0, 64))
        elif kind == 1:
            size = int(rng.integers(64, 4096))
        elif kind == 2:
            size = int(rng.integers(4096, 70000))   # straddles DataL/DataH
        else:
            size = int(rng.integers(70000, 220000))
        with open(p, "wb") as f:
            f.write(bytes(rng.integers(0, 256, size, dtype=np.uint8)))
    return nf


def one_case(i):
    rng = np.random.default_rng([SEED, i])
    mode = int(rng.integers(0, 4))
    encrypt = bool(rng.random() < 0.3) and mode != 0
    work = tempfile.mkdtemp(prefix=f"cc{i}_")
    try:
        tree = os.path.join(work, "tree")
        os.makedirs(tree)
        nf = make_tree(rng, tree, mode)
        ours = os.path.join(work, "ours.cpk")
        refp = os.path.join(work, "ref.cpk")
        kw = dict(CpkMode=mode)
        if encrypt:
            kw["encrypt"] = True
        try:
            ref.CPKBuilder(tree, refp, **kw)
        except Exception as e:
            # reference crashed on this tree: our builder must still work
            CPKBuilder(tree, ours, **kw)
            CPK(ours)
            return ("refcrash", f"mode={mode} nf={nf} {type(e).__name__}: {e}")
        CPKBuilder(tree, ours, **kw)
        a = open(ours, "rb").read()
        b = open(refp, "rb").read()
        if a != b:
            d = next(k for k in range(min(len(a), len(b)) + 1)
                     if k >= min(len(a), len(b)) or a[k] != b[k])
            return ("DIVERGE",
                    f"cpk mode={mode} enc={encrypt} nf={nf} "
                    f"lens={len(a)}/{len(b)} first_diff={d}")
        # AWB on the same tree (flat file list)
        ver = int(rng.integers(1, 3))
        sub = int(rng.integers(0, 0x10000)) if ver == 2 else 0
        oa, ra = os.path.join(work, "o.awb"), os.path.join(work, "r.awb")
        AWBBuilder(tree, subkey=sub, version=ver).build(oa)
        ref.AWBBuilder(tree, subkey=sub, version=ver).build(ra)
        if open(oa, "rb").read() != open(ra, "rb").read():
            return ("DIVERGE", f"awb sub={sub} ver={ver} nf={nf}")
        return ("ok", f"mode={mode} enc={encrypt} nf={nf}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


n_div = 0
for i in range(100):
    try:
        verdict, detail = one_case(i)
    except Exception:
        verdict, detail = "ERROR", traceback.format_exc(limit=4)
    if verdict != "ok":
        print(f"[{i}] {verdict}: {detail}", flush=True)
        n_div += verdict in ("DIVERGE", "ERROR")
    if i % 20 == 19:
        print(f"... {i+1} cases done", flush=True)
print("DIVERGENCES/ERRORS:", n_div)
sys.exit(1 if n_div else 0)
