#!/usr/bin/env python3
"""Produce MULTICHIP_r{N}.json: run dryrun_multichip(8) on a virtual CPU
mesh in a fresh subprocess and record rc/ok/tail.

Usage: python3 tools/make_multichip.py [N_DEVICES] [OUT.json]
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "MULTICHIP_local.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n}")
    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(%d)\n" % (ROOT, n))
    try:
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=3600)
        tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-3:])
        rec = {
            "n_devices": n,
            "rc": r.returncode,
            "ok": r.returncode == 0 and "dryrun_multichip OK" in r.stdout,
            "skipped": False,
            "tail": tail + "\n",
        }
    except subprocess.TimeoutExpired:
        # keep the artifact pipeline uniform on a hung dryrun (ADVICE r4)
        rec = {"n_devices": n, "rc": -1, "ok": False, "skipped": False,
               "tail": "timeout\n"}
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec, indent=2))
    sys.exit(0 if rec["ok"] else 1)


if __name__ == "__main__":
    main()
