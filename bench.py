"""Benchmark: batched HCA bank decode throughput (BASELINE config 5).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: decoded audio-seconds per wallclock second per chip, end-to-end
(host bitstream unpack + device transform + PCM copy-back) for a 256-stream
HCA bank. vs_baseline is measured against the BASELINE.json north-star of
1000x realtime per chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_X_REALTIME = 1000.0


def main():
    # A dead remote-TPU tunnel hangs backend init forever; probe it in a
    # throwaway subprocess first and fall back to CPU so the bench always
    # emits its metric line (the driver runs this unattended).
    import subprocess
    try:
        subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                       timeout=int(os.environ.get("BENCH_PROBE_S", "300")),
                       check=True, capture_output=True)
    except Exception as exc:  # noqa: BLE001
        print(f"TPU backend probe failed ({exc!r}); forcing CPU",
              file=sys.stderr)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    # On CPU fallback keep bit-exactness flags; on TPU run as-is.
    platform = jax.devices()[0].platform
    from pycricodecs_tpu import parallel
    from pycricodecs_tpu.ops import hca_encode_host
    from pycricodecs_tpu.utils.wav import write_wav

    n_streams = int(os.environ.get("BENCH_STREAMS", "256"))
    duration_s = float(os.environ.get("BENCH_SECONDS", "10.0"))
    sr = 48000
    samples = int(sr * duration_s)

    rng = np.random.default_rng(0)
    t = np.arange(samples) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 991 * t)
           + 0.02 * rng.standard_normal(samples))
    pcm = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    stereo = np.stack([pcm, np.roll(pcm, 480)], 1).reshape(-1)
    wav = write_wav(stereo, 2, sr)
    print(f"encoding {duration_s:.0f}s stereo reference stream...",
          file=sys.stderr)
    hca_blob = hca_encode_host.encode(wav, quality=2)
    blobs = [hca_blob] * n_streams
    audio_seconds = n_streams * duration_s

    engine = parallel.pick_hca_engine()
    print(f"platform={platform} devices={len(jax.devices())} "
          f"engine={engine} (d2h {parallel.measure_d2h_bandwidth():.0f} MB/s)",
          file=sys.stderr)
    # warmup at the real batch shape (compiles once; persistent cache reuses)
    t0 = time.perf_counter()
    parallel.decode_batch(blobs)
    print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # real-chip coverage of the batched device engine (Pallas IMDCT+OLA):
    # with auto routing to host lanes on slow links, this parity assertion
    # is what keeps the device path exercised on actual TPU hardware.
    guard_note = None
    if engine == "host" and platform == "tpu":
        # a guard FAILURE must be loud in the artifact but must not crash
        # the bench (the driver runs this unattended at round end)
        try:
            n_guard = 4
            dev = parallel.decode_batch(blobs[:n_guard], engine="device")
            host = parallel.decode_batch(blobs[:n_guard], engine="host")
            assert dev == host, \
                "device engine diverged from host lanes on TPU"
            print(f"device-engine parity guard: {n_guard} streams bit-exact "
                  f"on the real chip", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            guard_note = f"DEVICE GUARD FAILED: {exc!r}"
            print(guard_note, file=sys.stderr)

    # Interleaved reference measurement: the 1-core host VM throttles 2x
    # between runs (CLAUDE.md), so an absolute number alone cannot
    # distinguish regression from throttle. Each timing window decodes the
    # SAME bank with us and a sample with the compiled reference, so their
    # ratio is throttle-invariant.
    oracle = None
    try:
        sys.path.insert(0, "/tmp/refbuild")
        import CriCodecs as oracle  # noqa: N813
    except ImportError:
        print("reference oracle not built; skipping interleaved ratio",
              file=sys.stderr)
    hs = int.from_bytes(hca_blob[6:8], "big")
    n_ref = int(os.environ.get("BENCH_REF_FILES", "24"))

    best = 0.0
    best_ratio = 0.0
    for _ in range(int(os.environ.get("BENCH_RUNS", "5"))):
        stats = parallel.DecodeStats()
        t0 = time.perf_counter()
        out = parallel.decode_batch(blobs, stats=stats)
        elapsed = time.perf_counter() - t0
        assert len(out) == n_streams
        best = max(best, audio_seconds / elapsed)
        ratio_note = ""
        if oracle is not None:
            t1 = time.perf_counter()
            for _i in range(n_ref):
                oracle.HcaDecode(hca_blob, hs, 0, 0)
            ref_elapsed = time.perf_counter() - t1
            ref_x = (n_ref * duration_s) / ref_elapsed
            ratio = (audio_seconds / elapsed) / ref_x
            best_ratio = max(best_ratio, ratio)
            ratio_note = (f" | oracle {ref_x:.0f}x in-window ->"
                          f" ratio {ratio:.2f}")
        print(f"  run: {elapsed:.3f}s -> {audio_seconds/elapsed:.1f}x realtime"
              f" (unpack {stats.unpack_seconds:.2f}s dispatch+H2D"
              f" {stats.device_seconds:.2f}s D2H-bound tail"
              f" {stats.fetch_seconds:.2f}s){ratio_note}", file=sys.stderr)
    pcm_bytes = sum(len(o) for o in out)
    print(f"stage breakdown: PCM out {pcm_bytes/1e6:.0f}MB, engine={engine}."
          f" decode_batch(engine='auto') probes the device->host link once:"
          f" the tunnelled TPU's ~25-50MB/s link cannot carry bank PCM as"
          f" fast as the native host lanes produce it (~100MB/s/core), so"
          f" banks route to the C++ lanes there; on local-PCIe hardware the"
          f" batched device path wins and is chosen instead"
          f" (see README 'performance')", file=sys.stderr)

    extra = {}
    if best_ratio > 0:
        # audio-sec/s per core vs the reference decoding the same stream in
        # the same measurement windows (single-stream loop, same host)
        extra["vs_reference_interleaved"] = round(best_ratio, 3)
    if guard_note:
        extra["device_guard"] = guard_note
    if platform == "tpu":
        # link-independent on-device number (VERDICT r1): raw frames
        # pre-staged in HBM, unpack+transform on-chip, PCM left on device
        try:
            import bench_all
            res = bench_all.config10()   # tuple; [5] = extras dict (r5)
            x = res[1]
            print(f"on-device pipeline (link-independent, bit-exact):"
                  f" {x:.0f}x realtime/chip", file=sys.stderr)
            extra["device_pipeline_x_realtime"] = round(x, 2)
            if len(res) > 5 and isinstance(res[5], dict):
                mf = res[5].get("minus_fetch_audio_sec_per_sec_per_chip")
                if mf:
                    # completion-fetch round trip excluded (apparatus,
                    # not workload — see bench_all._fetch_rt)
                    extra["device_pipeline_minus_fetch"] = mf
        except Exception as exc:  # noqa: BLE001
            print(f"on-device pipeline measurement failed: {exc!r}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "hca_bank_decode_audio_sec_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(best / BASELINE_X_REALTIME, 4),
        **extra,
    }))


if __name__ == "__main__":
    main()
