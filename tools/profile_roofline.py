"""Roofline accounting for the on-device pipelines -> PROFILE_r{N}.json.

Times each pipeline stage on the real chip (scalar-fetch completion
barrier), pairs every stage with an analytic minimum-HBM-traffic model and
a VPU op-count model, and emits one committed JSON artifact so "fast" has
a denominator: measured GB/s vs the chip's HBM roofline, ops/coefficient
vs VPU throughput, and the implied ceiling for the next optimisation.

Usage:  BENCH_STREAMS=256 python3 tools/profile_roofline.py [out.json]

Chip model (TPU v5e / "v5 lite"): HBM ~819 GB/s, 8x128-lane VPU with ~4
int/fp ALUs per lane at 940 MHz (~3.85e12 elementwise ops/s), MXU 197
bf16 TFLOP/s.  Sources: public v5e spec sheet numbers.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pycricodecs_tpu.ops import hca_encode_host, hca_frame, hca_kernels
from pycricodecs_tpu.ops import hca_unpack_device
from pycricodecs_tpu.parallel import pipeline

HBM_GBPS = 819.0          # v5e HBM bandwidth
VPU_OPS = 3.85e12         # 8*128 lanes * ~4 ALUs * 940 MHz
MXU_BF16 = 197e12


def _sine_wav(dur, ch, seed=5, sr=48000):
    n = int(sr * dur)
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    pcm = np.zeros((n, ch))
    for c in range(ch):
        for f, a in ((220 * (c + 1), 0.4), (997, 0.2), (3301, 0.1)):
            pcm[:, c] += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    from pycricodecs_tpu.utils.wav import write_wav
    return write_wav(np.clip(pcm * 32767, -32768, 32767)
                     .astype("<i2").reshape(-1), ch, sr)


def _barrier(out):
    np.asarray(jax.tree_util.tree_leaves(out)[-1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _barrier(out)
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _barrier(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(os.environ.get("BENCH_STREAMS", "256"))
    dur = 10.0
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    blob = hca_encode_host.encode(_sine_wav(dur, 2, seed=5), quality=2)
    hs = int.from_bytes(blob[6:8], "big")
    info = hca_frame.parse_header(blob[:hs])
    fs, F, C = info.frame_size, info.frame_count, info.channels
    arr = np.frombuffer(blob[hs:hs + F * fs], np.uint8).reshape(F, fs)
    frames_np = np.broadcast_to(arr, (n, F, fs)).copy()
    audio_sec = n * dur
    rec = {"streams": n, "frames": F, "frame_size": fs, "channels": C,
           "audio_sec": audio_sec,
           "chip": {"hbm_gbps": HBM_GBPS, "vpu_ops_per_sec": VPU_OPS,
                    "mxu_bf16_flops": MXU_BF16},
           "stages": {}}

    pairs = hca_kernels.stereo_pairs_of(info.channel_type) \
        if info.stereo_band_count > 0 else ()
    use_pallas = jax.devices()[0].platform == "tpu"
    up = hca_unpack_device.DeviceUnpacker(info)
    hfrm = hca_kernels.build_hfr_map(
        info.total_band_count, info.base_band_count, info.stereo_band_count,
        info.bands_per_hfr_group, info.hfr_group_count, info.version)
    hfr_args = tuple(jax.device_put(a) for a in (
        np.asarray(hfrm.band_is_hfr), np.asarray(hfrm.src_band),
        np.asarray(hfrm.group_of), np.int32(hfrm.zero_band)))
    dev = jax.device_put(frames_np)
    cipher_dev = jax.device_put(np.asarray(info.cipher, np.uint8))
    ath_dev = jax.device_put(np.asarray(info.ath, np.int32))

    NF = n * F
    coeffs = NF * C * 8 * 128               # spectrum slots
    # --- analytic minimum HBM traffic (bytes), per stage --------------------
    qc_bytes = coeffs * 2                    # int16 quantised coefficients
    side_bytes = NF * C * (128 + 128 + 8)    # sf + res (u8) + intensity
    traffic = {
        # frames read + u32 word table write+read + qc/side write
        "unpack": NF * fs * 3 + qc_bytes + side_bytes,
        # qc/side read + PCM int16 write (spectra stay in VMEM when fused)
        "transform": qc_bytes + side_bytes + coeffs * 2,
    }
    traffic["fused"] = traffic["unpack"] + traffic["transform"] \
        - (qc_bytes + side_bytes)            # handoff stays on-chip only if
    # the megakernel consumed qc directly; today it round-trips HBM:
    traffic["fused"] = traffic["unpack"] + traffic["transform"]

    # --- VPU op model -------------------------------------------------------
    # per coefficient: VLC fetch share (~600 ops / 10-symbol superstep) +
    # decode chain ~70 ops (measured op audit, CLAUDE.md round-2 notes)
    ops = {
        "unpack": coeffs * (70 + 60),
        # dequant+HFR+intensity ~25 ops + IMDCT 14 stages * ~4 + OLA ~6
        "transform": coeffs * (25 + 56 + 6),
    }
    ops["fused"] = ops["unpack"] + ops["transform"]

    # --- measured stage times ----------------------------------------------
    fused = pipeline._get_fused_device_decode(info, pairs, use_pallas)

    @jax.jit
    def run_full(frames, cipher, ath, hi, hsrc, hg, hz):
        pcm, err = fused(frames, cipher, ath, hi, hsrc, hg, hz)
        return pcm, jnp.any(err) | (pcm[0, 0, 0, 0, 0] == 12345)

    t_full, _ = timeit(run_full, dev, cipher_dev, ath_dev, *hfr_args)

    @jax.jit
    def run_unpack(frames, cipher, ath):
        B, Fx, fsx = frames.shape
        qc, sf, res, inten, err, *_ = up._unpack(
            frames.reshape(B * Fx, fsx), cipher, ath, B=B)
        return qc, jnp.any(err) | (qc[0, 0, 0] == 12345)

    t_unpack, unp = timeit(run_unpack, dev, cipher_dev, ath_dev)
    t_transform = max(t_full - t_unpack, 1e-9)

    for name, t in (("unpack", t_unpack), ("transform", t_transform),
                    ("fused", t_full)):
        gbps = traffic[name] / t / 1e9
        vops = ops[name] / t
        rec["stages"][name] = {
            "ms": round(t * 1e3, 2),
            "audio_sec_per_sec": round(audio_sec / t, 0),
            "min_hbm_traffic_gb": round(traffic[name] / 1e9, 3),
            "achieved_gbps": round(gbps, 1),
            "pct_hbm_roofline": round(100 * gbps / HBM_GBPS, 2),
            "model_ops_per_coeff": round(ops[name] / coeffs, 1),
            "achieved_vpu_ops_per_sec": round(vops, -9),
            "pct_vpu_roofline": round(100 * vops / VPU_OPS, 1),
        }

    # --- encode pipeline stage split ----------------------------------------
    from pycricodecs_tpu.ops import hca_encode_device as D
    from pycricodecs_tpu.ops import hca_tables as T
    from pycricodecs_tpu.ops.hca_hfr_device import _group_counts
    from pycricodecs_tpu.utils import wav as wavmod

    w = wavmod.parse_wav(_sine_wav(dur, 2, seed=5))
    cfg = hca_encode_host.init_encode(w, 2, w.looping)
    einfo = cfg.info
    Fp = -(-einfo.frame_count // 16) * 16
    one = np.zeros((1, einfo.channels, Fp * 1024), np.int16)
    tl = hca_encode_host.build_timeline(cfg, w)
    one[0, :, :tl.shape[1]] = tl
    pcm_np = np.broadcast_to(one, (n, einfo.channels, Fp * 1024)).copy()
    epairs = tuple((c, c + 1) for c in range(einfo.channels - 1)
                   if einfo.channel_type[c] == T.STEREO_PRIMARY) \
        if einfo.stereo_band_count > 0 else ()
    counts, counts2 = _group_counts(einfo, int(cfg.hfr_band_count))
    ekw = dict(
        base_band=int(einfo.base_band_count),
        total_band=int(einfo.total_band_count), pairs=epairs,
        coded_counts=tuple(int(x) for x in einfo.coded_count),
        channel_types=tuple(int(x) for x in einfo.channel_type),
        hfr_group_count=int(einfo.hfr_group_count),
        bands_per_hfr_group=int(einfo.bands_per_hfr_group),
        hfr_band_count=int(cfg.hfr_band_count),
        frame_size=int(einfo.frame_size),
        use_pallas=jax.devices()[0].platform == "tpu")
    pdev = jax.device_put(pcm_np)

    @jax.jit
    def run_enc_transform(pcm):
        out = D.hca_encode_transform(pcm, **ekw)
        return out, out[4][0, 0] + 0   # level scalar

    t_etrans, _ = timeit(run_enc_transform, pdev, reps=3)

    @jax.jit
    def run_enc_full(pcm):
        frames, fb = D.hca_encode_frames(
            pcm, hfr_counts=tuple(counts), hfr_counts2=tuple(counts2), **ekw)
        return frames, jnp.any(fb) ^ (frames[0, 0, 0] == 255)

    t_efull, _ = timeit(run_enc_full, pdev, reps=3)
    t_pack = max(t_efull - t_etrans, 1e-9)
    eF = n * Fp
    rec["encode_stages"] = {
        "transform_ms": round(t_etrans * 1e3, 2),
        "hfr_plus_pack_ms": round(t_pack * 1e3, 2),
        "full_ms": round(t_efull * 1e3, 2),
        "audio_sec_per_sec": round(audio_sec / t_efull, 0),
        # packer threshold-sum op model: 2 contributions x ~3 ops over
        # (symbols x words+1) per frame
        # python ints throughout: numpy scalars overflow in this product
        "pack_model_ops": int(eF) * (2 + 2 * int(einfo.channels)
                                     + 8 * int(sum(
                                         einfo.coded_count[:einfo.channels])))
        * (int(einfo.frame_size) // 4 + 1) * 6,
    }
    rec["encode_stages"]["pack_model_pct_vpu"] = round(
        100 * rec["encode_stages"]["pack_model_ops"] / t_pack / VPU_OPS, 1)

    print(json.dumps(rec, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
