"""Fine-grained on-chip timing of the HCA device-encode pipeline.

PROFILE_r03 showed hfr+pack (153 ms) costing more than the whole fused
decode (95 ms) for the same 256x10s bank, with the packer's threshold-sum
model at 0.1% VPU — i.e. the wall is overhead, not the reduce.  This script
splits the encode into separately-jitted segments (each with a scalar
completion fetch) so the wall has a name:

  transform      hca_encode_transform (MDCT .. quantise, rate control)
  hfr            hfr_scales_device
  pack.symbols   symbol (value,bits) build (spectrum muxes, sf deltas)
  pack.offsets   cumsum -> per-symbol word/shift split
  pack.scatter   _scatter_words (chunk threshold sums + MXU placement)
  pack.crc       parity-of-popcount CRC + byte layout
  pack.full      pack_frames_device (fused; != sum of parts, XLA refuses)
  full           hca_encode_frames end to end

Usage: BENCH_STREAMS=256 python3 tools/profile_encode_stages.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pycricodecs_tpu.ops import hca_encode_host
from pycricodecs_tpu.ops import hca_encode_device as D
from pycricodecs_tpu.ops import hca_pack_device as PK
from pycricodecs_tpu.ops import hca_tables as T
from pycricodecs_tpu.ops.hca_hfr_device import _group_counts, \
    hfr_scales_device
from pycricodecs_tpu.utils import wav as wavmod
from pycricodecs_tpu.utils.wav import write_wav

u32 = jnp.uint32
i32 = jnp.int32


def _sine_wav(dur, ch, seed=5, sr=48000):
    n = int(sr * dur)
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    pcm = np.zeros((n, ch))
    for c in range(ch):
        pcm[:, c] = (0.4 * np.sin(2 * np.pi * (440 + 7 * c) * t)
                     + 0.1 * np.sin(2 * np.pi * 991 * t)
                     + 0.02 * rng.standard_normal(n))
    pcm = np.clip(pcm * 32767, -32768, 32767).astype(np.int16)
    return write_wav(pcm.reshape(-1), ch, sr)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out[-1])          # completion barrier: tiny scalar fetch
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from pycricodecs_tpu.parallel.pipeline import _ensure_compile_cache
    _ensure_compile_cache()
    n, dur = int(os.environ.get("BENCH_STREAMS", "256")), 10.0
    w = wavmod.parse_wav(_sine_wav(dur, 2))
    cfg = hca_encode_host.init_encode(w, 2, w.looping)
    info = cfg.info
    C = info.channels
    Fp = -(-info.frame_count // 16) * 16
    one = np.zeros((1, C, Fp * 1024), np.int16)
    tl = hca_encode_host.build_timeline(cfg, w)
    one[0, :, :tl.shape[1]] = tl
    pcm_np = np.broadcast_to(one, (n, C, Fp * 1024)).copy()
    pairs = tuple((c, c + 1) for c in range(C - 1)
                  if info.channel_type[c] == T.STEREO_PRIMARY) \
        if info.stereo_band_count > 0 else ()
    counts, counts2 = _group_counts(info, int(cfg.hfr_band_count))
    ekw = dict(
        base_band=int(info.base_band_count),
        total_band=int(info.total_band_count), pairs=pairs,
        coded_counts=tuple(int(x) for x in info.coded_count),
        channel_types=tuple(int(x) for x in info.channel_type),
        hfr_group_count=int(info.hfr_group_count),
        bands_per_hfr_group=int(info.bands_per_hfr_group),
        hfr_band_count=int(cfg.hfr_band_count),
        frame_size=int(info.frame_size),
        use_pallas=jax.devices()[0].platform == "tpu")
    fs = int(info.frame_size)
    G = int(info.hfr_group_count)
    pdev = jax.device_put(pcm_np)
    rec = {"streams": n, "frames": Fp, "frame_size": fs, "channels": C}

    @jax.jit
    def run_transform(pcm):
        out = D.hca_encode_transform(pcm, **ekw)
        return out, out[4][0, 0] + 0

    t = timeit(run_transform, pdev, reps=3)
    rec["transform_ms"] = round(t * 1e3, 2)
    outs, _ = run_transform(pdev)
    # keep intermediates as DEVICE arrays: fetching them over the tunnel
    # costs minutes per GB and round-tripping doubles HBM footprint
    sf, res, intensity, quant, level, boundary, delta_bits, ga, gs = outs

    @jax.jit
    def run_hfr(ga, gs):
        scales, guard = hfr_scales_device(
            ga, gs, counts=tuple(counts), counts2=tuple(counts2),
            channel_types=ekw["channel_types"])
        return scales, jnp.any(guard) ^ (scales[0, 0, 0, 0] == -5)

    rec["hfr_ms"] = round(timeit(run_hfr, ga, gs) * 1e3, 2)
    hfr_scales = run_hfr(ga, gs)[0]

    pkw = dict(channels=C, coded_counts=ekw["coded_counts"],
               channel_types=ekw["channel_types"],
               hfr_group_count=G, frame_size=fs)

    @jax.jit
    def run_pack(level, boundary, sf, res, intensity, hfr_scales,
                 delta_bits, quant):
        frames = PK.pack_frames_device(level, boundary, sf, res, intensity,
                                       hfr_scales, delta_bits, quant, **pkw)
        return frames, frames[0, 0, 0] + frames[-1, -1, -1]

    pack_args = (level, boundary, sf, res, intensity, hfr_scales,
                 delta_bits, quant)
    rec["pack_full_ms"] = round(timeit(run_pack, *pack_args) * 1e3, 2)

    # ---- pack sub-stages (replicating pack_frames_device's boundaries) ----
    coded_counts = ekw["coded_counts"]
    channel_types = ekw["channel_types"]

    def build_symbols(level, boundary, sf, res, intensity, hfr_scales,
                      delta_bits, quant):
        B, F = level.shape
        values = [jnp.broadcast_to(u32(0xFFFF), (B, F))[..., None]]
        widths = [jnp.broadcast_to(i32(16), (B, F))[..., None]]
        hdr = ((level.astype(i32) & 0x1FF) << 7) \
            | (boundary.astype(i32) & 0x7F)
        values.append(hdr.astype(u32)[..., None])
        widths.append(jnp.broadcast_to(i32(16), (B, F))[..., None])
        sf_i = sf.astype(i32)
        for c in range(C):
            cc = int(coded_counts[c])
            db = delta_bits[..., c].astype(i32)
            values.append((db.astype(u32) & 7)[..., None])
            widths.append(jnp.broadcast_to(i32(3), (B, F))[..., None])
            v, b = PK._scalefactor_symbols(sf_i[..., c, :cc], db)
            values.append(v)
            widths.append(b)
            if channel_types[c] == PK.STEREO_SECONDARY:
                values.append(intensity[..., c, :].astype(u32))
                widths.append(jnp.broadcast_to(i32(4), (B, F, 8)))
            elif G > 0:
                values.append(hfr_scales[..., c, :G].astype(u32))
                widths.append(jnp.broadcast_to(i32(6), (B, F, G)))
        v_spec, b_spec = PK._spectrum_symbols(res, quant)
        v_spec = jnp.moveaxis(v_spec, 3, 2)
        b_spec = jnp.moveaxis(b_spec, 3, 2)
        cc = int(coded_counts[0])
        values.append(v_spec[..., :cc].reshape(B, F, 8 * C * cc))
        widths.append(b_spec[..., :cc].reshape(B, F, 8 * C * cc))
        return jnp.concatenate(values, -1), jnp.concatenate(widths, -1)

    @jax.jit
    def run_symbols(*args):
        value, bits = build_symbols(*args)
        return (value, bits), value[0, 0, 0] + bits[-1, -1, -1].astype(u32)

    rec["pack_symbols_ms"] = round(timeit(run_symbols, *pack_args) * 1e3, 2)
    (value_d, bits_d), _ = run_symbols(*pack_args)

    @jax.jit
    def run_offsets(value, bits):
        off = PK._exclusive_prefix(bits)   # the shipped hierarchical prefix
        keep = (off + bits) <= (fs * 8)
        bcl = jnp.minimum(bits, 31)
        value = jnp.where(keep, value & ((u32(1) << bcl.astype(u32)) - 1), 0)
        w_n = (off >> 5).astype(i32)
        rel = (off & 31).astype(i32)
        end = rel + bits
        sh_hi_le = jnp.clip(32 - end, 0, 31).astype(u32)
        sh_hi_gt = jnp.clip(end - 32, 0, 31).astype(u32)
        hi = jnp.where(end <= 32, value << sh_hi_le, value >> sh_hi_gt)
        sh_lo = jnp.clip(64 - end, 0, 31).astype(u32)
        lo = jnp.where(end > 32, value << sh_lo, u32(0))
        return (w_n, hi, lo), hi[0, 0, 0] ^ lo[-1, -1, -1]

    rec["pack_offsets_ms"] = round(timeit(run_offsets, value_d, bits_d)
                                   * 1e3, 2)
    (w_n, hi, lo), _ = run_offsets(value_d, bits_d)
    W = -(-fs // 4)

    @jax.jit
    def run_scatter(w_n, hi, lo):
        words = PK._scatter_words(w_n, hi, lo, W, max_sym_bits=13)
        return words, words[0, 0, 0] ^ words[-1, -1, -1]

    rec["pack_scatter_ms"] = round(timeit(run_scatter, w_n, hi, lo)
                                   * 1e3, 2)
    words, _ = run_scatter(w_n, hi, lo)
    del value_d, bits_d    # release HBM before the full-pipeline reruns

    @jax.jit
    def run_crc(words):
        M = jnp.asarray(PK._crc_mask_table(fs, W))
        cnt = jnp.sum(jax.lax.population_count(words[..., None] & M),
                      axis=-2, dtype=i32)
        crc = jnp.sum((cnt & 1).astype(u32)
                      << jnp.arange(16, dtype=u32), axis=-1, dtype=u32)
        le = jax.lax.bitcast_convert_type(words, jnp.uint8)
        be = jnp.stack([le[..., 3], le[..., 2], le[..., 1], le[..., 0]],
                       axis=-1)
        payload = be.reshape(words.shape[0], words.shape[1], W * 4)
        return (payload, crc), crc[0, 0] ^ crc[-1, -1]

    rec["pack_crc_ms"] = round(timeit(run_crc, words) * 1e3, 2)
    del w_n, hi, lo, words, outs, sf, res, intensity, quant, level, \
        boundary, delta_bits, ga, gs, hfr_scales, pack_args

    @jax.jit
    def run_full(pcm):
        frames, fb = D.hca_encode_frames(
            pcm, hfr_counts=tuple(counts), hfr_counts2=tuple(counts2),
            **ekw)
        return frames, jnp.any(fb) ^ (frames[0, 0, 0] == 255)

    rec["full_ms"] = round(timeit(run_full, pdev, reps=3) * 1e3, 2)
    rec["audio_sec_per_sec"] = round(n * dur / (rec["full_ms"] / 1e3), 0)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
