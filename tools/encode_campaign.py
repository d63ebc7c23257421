"""Differential campaign: the fused on-device HCA encode pipeline
(encode_batch_device(pack="device"): transform -> certified-exact HFR
normalisation -> device frame packer) vs the exact host encoder, which is
itself byte-identical to the compiled reference (1500-case crypt/encode
campaign, round 2).

Random content kinds x qualities x channel counts x rates x loop flags,
batched in mixed-length groups so the frame padding and per-stream slicing
paths are exercised.  Any byte difference is a real break: the device
pipeline either certifies exactness (HFR guard band unflagged, rate
control converged) or reroutes the stream to the host encoder — so output
must ALWAYS equal the host encoder's.

Usage: python3 tools/encode_campaign.py [n_cases] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from pycricodecs_tpu.ops import hca_encode_device, hca_encode_host
from pycricodecs_tpu.utils.wav import write_wav

SEED = 20260819


def content(rng, kind, n, ch, sr):
    t = np.arange(n) / sr
    x = np.zeros((ch, n))
    for c in range(ch):
        if kind == 0:      # tonal
            for _ in range(4):
                f = rng.uniform(40, sr / 2.2)
                x[c] += rng.uniform(0.05, 0.4) * np.sin(
                    2 * np.pi * f * t + rng.uniform(0, 6.28))
        elif kind == 1:    # noise
            x[c] = rng.standard_normal(n) * rng.uniform(0.05, 0.5)
        elif kind == 2:    # sweep
            f0, f1 = rng.uniform(30, 200), rng.uniform(1000, sr / 2.05)
            x[c] = 0.5 * np.sin(2 * np.pi * (f0 + (f1 - f0) * t
                                             / t[-1] / 2) * t)
        elif kind == 3:    # impulses + silence
            x[c, rng.integers(0, n, 40)] = rng.uniform(-1, 1, 40)
        elif kind == 4:    # square-ish
            x[c] = np.sign(np.sin(2 * np.pi * rng.uniform(60, 800) * t)) \
                * rng.uniform(0.2, 0.8)
        else:              # near-silence dither
            x[c] = rng.standard_normal(n) * 2e-4
    pcm = np.clip(x * 28000, -32768, 32767).astype(np.int16)
    return pcm.T.reshape(-1)


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else SEED
    group, metas = [], []
    failures = 0
    done = 0

    def flush():
        nonlocal failures, done
        if not group:
            return
        got = hca_encode_device.encode_batch_device(
            group, quality=metas[0][0],
            force_not_looping=metas[0][1], pack="device")
        for g, wav, (q, fnl, label) in zip(got, group, metas):
            want = hca_encode_host.encode(wav, quality=q,
                                          force_not_looping=fnl)
            if g != want:
                failures += 1
                print(f"DIVERGE: {label}")
            done += 1
        group.clear()
        metas.clear()

    prev_key = None
    for i in range(n_cases):
        rng = np.random.default_rng([seed, i])
        kind = int(rng.integers(0, 6))
        q = int(rng.integers(0, 5))
        ch = int(rng.choice([1, 1, 2, 2, 2, 4, 6, 8]))
        sr = int(rng.choice([16000, 22050, 32000, 44100, 48000]))
        secs = float(rng.uniform(0.15, 3.0))
        loop = bool(rng.integers(0, 2))
        n = max(256, int(sr * secs))
        pcm = content(rng, kind, n, ch, sr)
        if loop and n > 4096:
            wav = write_wav(pcm, ch, sr, looping=True,
                            loop_start=n // 4, loop_end=n // 2)
        else:
            wav = write_wav(pcm, ch, sr)
        key = (q, ch, sr)
        if prev_key is not None and key != prev_key:
            flush()
        prev_key = key
        group.append(wav)
        metas.append((q, False, f"case {i}: kind={kind} q={q} ch={ch} "
                                f"sr={sr} n={n} loop={loop}"))
        if len(group) >= 6:
            flush()
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{n_cases} cases, {failures} divergences",
                  flush=True)
    flush()
    print(f"DONE: {done} encodes compared, {failures} divergences")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
