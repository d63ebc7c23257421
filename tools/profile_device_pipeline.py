"""Stage-level profiling of the on-device HCA decode pipeline (real TPU).

Times the fused pipeline and each half separately (Pallas vs XLA unpack
engines, megakernel vs jnp transform) with the scalar-fetch completion
barrier the tunnel requires, and runs the one-stream byte parity guard.
Remember: every host-side fetch costs ~27ms round-trip on the tunnel —
compare numbers, not absolutes. Usage:
    BENCH_STREAMS=256 python3 tools/profile_device_pipeline.py
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from pycricodecs_tpu.ops import hca_encode_host, hca_frame, hca_kernels
from pycricodecs_tpu.ops import hca_unpack_device
from pycricodecs_tpu.parallel import pipeline


def _sine_wav(dur, ch, seed=5):
    sr = 48000
    n = int(sr * dur)
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    pcm = np.zeros((n, ch), dtype=np.float64)
    for c in range(ch):
        for f, a in ((220 * (c + 1), 0.4), (997, 0.2), (3301, 0.1)):
            ph = rng.uniform(0, 2 * np.pi)
            pcm[:, c] += a * np.sin(2 * np.pi * f * t + ph)
    pcm16 = np.clip(pcm * 32767, -32768, 32767).astype("<i2")
    import io, struct
    buf = io.BytesIO()
    data = pcm16.tobytes()
    buf.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
    buf.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                    sr * ch * 2, ch * 2, 16))
    buf.write(b"data" + struct.pack("<I", len(data)) + data)
    return buf.getvalue()


n, dur = int(os.environ.get("BENCH_STREAMS", "256")), 10.0
blob = hca_encode_host.encode(_sine_wav(dur, 2, seed=5), quality=2)
hs = int.from_bytes(blob[6:8], "big")
info = hca_frame.parse_header(blob[:hs])
fs, F = info.frame_size, info.frame_count
arr = np.frombuffer(blob[hs:hs + F * fs], np.uint8).reshape(F, fs)
frames_np = np.broadcast_to(arr, (n, F, fs)).copy()
print(f"n={n} F={F} fs={fs} C={info.channels}", flush=True)

pairs = hca_kernels.stereo_pairs_of(info.channel_type) \
    if info.stereo_band_count > 0 else ()
use_pallas = jax.devices()[0].platform == "tpu"
up = hca_unpack_device.DeviceUnpacker(info)
hfr = hca_kernels.build_hfr_map(
    info.total_band_count, info.base_band_count, info.stereo_band_count,
    info.bands_per_hfr_group, info.hfr_group_count, info.version)
hfr_static = hca_kernels.hfr_static_of(hfr) if (
    info.bands_per_hfr_group > 0 and info.hfr_group_count > 0) else None
base_band = int(info.base_band_count)
total_band = int(info.total_band_count)
apply_hfr = bool(info.bands_per_hfr_group > 0 and info.hfr_group_count > 0)
hfr_group_count = int(info.hfr_group_count)

dev = jax.device_put(frames_np)
cipher_dev = jax.device_put(np.asarray(info.cipher, np.uint8))
ath_dev = jax.device_put(np.asarray(info.ath, np.int32))
hfr_args = tuple(jax.device_put(a) for a in
                 (np.asarray(hfr.band_is_hfr), np.asarray(hfr.src_band),
                  np.asarray(hfr.group_of), np.int32(hfr.zero_band)))


def _barrier(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _barrier(out)
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _barrier(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms  ({n*dur/best:.0f}x rt)",
          flush=True)
    return out


# 1. full fused (new megakernel + pallas coefficient phase)
fused = pipeline._get_fused_device_decode(info, pairs, use_pallas)
@jax.jit
def run_full(frames, cipher, ath, hi, hsrc, hg, hz):
    pcm, err = fused(frames, cipher, ath, hi, hsrc, hg, hz)
    return pcm, jnp.any(err) | (pcm[0, 0, 0, 0, 0] == 12345)
out_full = timeit("full fused", run_full, dev, cipher_dev, ath_dev,
                  *hfr_args)

# parity guard vs host decode (one stream)
from pycricodecs_tpu.models import hca as hcamod
pcm_dev = np.asarray(out_full[0][0]).reshape(-1, info.channels)
samples = (F * 1024 - info.encoder_delay - info.encoder_padding)
one = pcm_dev[info.encoder_delay:info.encoder_delay + samples]
ref = hcamod.decode(blob)
ref_pcm = np.frombuffer(ref[44:], "<i2").reshape(-1, info.channels)
print("PARITY:", "OK" if np.array_equal(one, ref_pcm) else "DIVERGED",
      flush=True)

# 2. unpack only (pallas coefficient kernel inside)
@jax.jit
def run_unpack(frames, cipher, ath):
    B, Fx, fsx = frames.shape
    qc, sf, res, inten, err, *_ = up._unpack(
        frames.reshape(B * Fx, fsx), cipher, ath, B=B)
    return (jnp.sum(qc.astype(jnp.int32)), jnp.any(err))
timeit("unpack only (pallas coef)", run_unpack, dev, cipher_dev, ath_dev)

# 3. unpack only with XLA scan coefficients
os.environ["PYCRICODECS_NO_PALLAS_UNPACK"] = "1"
up2 = hca_unpack_device.DeviceUnpacker(info)
@jax.jit
def run_unpack_xla(frames, cipher, ath):
    B, Fx, fsx = frames.shape
    qc, sf, res, inten, err, *_ = up2._unpack(
        frames.reshape(B * Fx, fsx), cipher, ath, B=B)
    return (jnp.sum(qc.astype(jnp.int32)), jnp.any(err))
timeit("unpack only (XLA coef)", run_unpack_xla, dev, cipher_dev, ath_dev)
del os.environ["PYCRICODECS_NO_PALLAS_UNPACK"]

# 4. transform megakernel alone (pre-unpacked inputs)
B = n
qc, sf, res, inten, err, *_ = jax.jit(
    lambda f, c, a: up._unpack(f.reshape(B * F, fs), c, a, B=B)
)(dev, cipher_dev, ath_dev)
qc = qc.reshape(B, F, up.C, 8, 128)
sf = sf.reshape(B, F, up.C, 128)
res = res.reshape(B, F, up.C, 128)
inten = inten.reshape(B, F, up.C, 8)

@jax.jit
def run_mega(qc, sf, res, inten):
    out = hca_kernels._fused_transform(
        qc, sf, res, inten, base_band=base_band, total_band=total_band,
        stereo_pairs=pairs, apply_hfr=apply_hfr,
        hfr_group_count=hfr_group_count, hfr_static=hfr_static,
        interpret=False)
    return out, out[0, 0, 0, 0, 0]
timeit("transform megakernel", run_mega, qc, sf, res, inten)

# 5. old jnp+pallas-ola transform for comparison
zeros5u = jnp.zeros((1,) * 5, jnp.uint8)
zeros5b = jnp.zeros((1,) * 5, bool)
@jax.jit
def run_old(qc, sf, res, inten, hi, hsrc, hg, hz):
    spectra = hca_kernels._reconstruct_spectra(
        qc, sf, res, inten, zeros5u, zeros5u, zeros5b, hi, hsrc, hg, hz,
        base_band=base_band, total_band=total_band, stereo_pairs=pairs,
        apply_noise=False, apply_hfr=apply_hfr,
        hfr_group_count=hfr_group_count, hfr_static=hfr_static)
    from pycricodecs_tpu.ops import pallas_kernels
    Bx, Fx, C = spectra.shape[0], spectra.shape[1], spectra.shape[2]
    spec_t = jnp.moveaxis(spectra, 2, 1).reshape(Bx * C, Fx * 8, 128)
    wave = pallas_kernels.imdct_ola_pallas(spec_t).reshape(Bx, C, Fx * 8,
                                                           128)
    scaled = wave * jnp.float32(32768.0)
    ints = jnp.clip(scaled.astype(jnp.int32), -32768,
                    32767).astype(jnp.int16)
    o = jnp.moveaxis(ints.reshape(Bx, C, Fx, 8, 128), 1, 4)
    return o, o[0, 0, 0, 0, 0]
timeit("transform old (jnp+ola)", run_old, qc, sf, res, inten, *hfr_args)
