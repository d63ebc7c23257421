"""HCA CBR encoder (writes HCA v2.0), numpy-vectorised host implementation.

Behaviour parity target: the reference encoder (hca.cpp:2206-3164): same
bitrate/band derivation, MDCT, intensity-stereo quantisation, scalefactor
search, HFR scales, rate control (noise-level/boundary binary searches with
the top-band-zeroing fallback) and frame packing — byte-identical output.

Vectorisation strategy: frames are independent end-to-end in the encoder
except the one-subframe MDCT overlap (a pure shift), so every stage runs as
numpy array ops over the whole frame axis at once. The few accumulations whose
fp32 *rounding order* is observable (intensity energies, HFR averages) run as
short sequential loops over the band axis with vector [frames] accumulators,
reproducing the reference's exact summation order.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import hca_frame
from . import hca_tables as T
from ..utils import wav as wavmod
from ..utils.crc import crc16

f32 = np.float32
f64 = np.float64

SAMPLES_PER_FRAME = 1024
SUBFRAMES = 8


def _div_round_up(value: int, divisor: int) -> int:
    """(int)ceil((float)value / divisor) — float32 division like the reference."""
    return int(math.ceil(f32(value) / f32(divisor)))


def _get_next_multiple(value: int, multiple: int) -> int:
    if multiple <= 0 or value % multiple == 0:
        return value
    return value + multiple - value % multiple


def calculate_bitrate(channels: int, sample_rate: int, quality: int) -> int:
    pcm_bitrate = sample_rate * channels * 16
    max_bitrate = pcm_bitrate // 4
    # C switch on the enum: Highest..Lowest = 0..4. The Python-level quality
    # value 5 ("Lowest" in chunk.py) falls through to the default ratio 6,
    # exactly like the reference (hca.cpp:2210-2227 + chunk.py:68-73).
    ratios = {0: 4, 1: 6, 2: 8,
              3: 10 if channels == 1 else 12,
              4: 12 if channels == 1 else 16}
    ratio = ratios.get(quality, 6)
    bitrate = pcm_bitrate // ratio
    return min(bitrate, max_bitrate)


@dataclass
class EncConfig:
    info: hca_frame.HcaInfo
    post_samples: int
    buffer_pre_samples: int
    sample_count_per_channel: int
    input_sample_count: int
    hfr_band_count: int


def init_encode(wav: wavmod.WavFile, quality: int, loop_flag: bool) -> EncConfig:
    """Mirror of initHCAEncode (hca.cpp:2414-2462)."""
    info = hca_frame.HcaInfo()
    info.version = 0x0200
    info.channels = wav.channels
    info.track_count = 1
    info.sample_rate = wav.sample_rate
    info.min_resolution = 1
    info.max_resolution = 15
    info.encoder_delay = 128
    info.loop_flag = loop_flag
    cutoff = wav.sample_rate // 2
    post_samples = 128

    scc = wav.num_samples // wav.channels

    bitrate = calculate_bitrate(info.channels, info.sample_rate, quality)

    # CalculateBandCounts (hca.cpp:2236-2270)
    info.frame_size = bitrate * 1024 // info.sample_rate // 8
    pcm_bitrate = info.sample_rate * info.channels * 16
    if info.channels <= 1 or pcm_bitrate // bitrate <= 6:
        hfr_ratio, cutoff_ratio = 6, 12
    else:
        hfr_ratio, cutoff_ratio = 8, 16
    if bitrate < pcm_bitrate // cutoff_ratio:
        cutoff = min(cutoff, cutoff_ratio * bitrate // (32 * info.channels))
    total_band_count = int(round(cutoff * 256.0 / info.sample_rate))
    hfr_start_band = min(total_band_count,
                         int(round(hfr_ratio * bitrate * 128.0 / pcm_bitrate)))
    stereo_start_band = hfr_start_band if hfr_ratio == 6 else (hfr_start_band + 1) // 2
    hfr_band_count_init = total_band_count - hfr_start_band
    bands_per_group = _div_round_up(hfr_band_count_init, 8)
    num_groups = _div_round_up(hfr_band_count_init, bands_per_group) \
        if bands_per_group > 0 else 0
    info.total_band_count = total_band_count
    info.base_band_count = stereo_start_band
    info.stereo_band_count = hfr_start_band - stereo_start_band
    info.hfr_group_count = num_groups
    info.bands_per_hfr_group = bands_per_group

    # CalculateHfrValues (hca.cpp:2272-2277)
    hfr_band_count = 0
    if info.bands_per_hfr_group > 0:
        hfr_band_count = (info.total_band_count - info.base_band_count
                          - info.stereo_band_count)
        info.hfr_group_count = _div_round_up(hfr_band_count, info.bands_per_hfr_group)

    # SetChannelConfiguration (hca.cpp:2279-2290)
    cpt = info.channels // info.track_count
    config = int(T.DEFAULT_CHANNEL_MAPPING[cpt])
    if T.VALID_CHANNEL_MAPPINGS[cpt - 1][config] != 1:
        raise hca_frame.HcaError("Error setting up channel configuration.")
    info.channel_config = config

    sample_count_per_channel = scc
    input_sample_count = scc
    if loop_flag:
        loop_start, loop_end = wav.loop_start, wav.loop_end
        sample_count_per_channel = min(loop_end, wav.num_samples)
        info.encoder_delay += _get_next_multiple(loop_start, SAMPLES_PER_FRAME) - loop_start
        # CalculateLoopInfo (hca.cpp:2292-2305)
        ls = loop_start + info.encoder_delay
        le = loop_end + info.encoder_delay
        info.loop_start_frame = ls // SAMPLES_PER_FRAME
        info.loop_start_delay = ls % SAMPLES_PER_FRAME
        info.loop_end_frame = le // SAMPLES_PER_FRAME
        info.loop_end_padding = SAMPLES_PER_FRAME - le % SAMPLES_PER_FRAME
        if info.loop_end_padding == SAMPLES_PER_FRAME:
            info.loop_end_frame -= 1
            info.loop_end_padding = 0
        input_sample_count = min(
            _get_next_multiple(sample_count_per_channel, 128), wav.num_samples)
        input_sample_count += 128 * 2
        post_samples = input_sample_count - sample_count_per_channel

    # CalculateHeaderSize (hca.cpp:2307-2321)
    info.header_size = _get_next_multiple(96, 32)
    if loop_flag:
        loop_frame_offset = info.header_size + info.frame_size * info.loop_start_frame
        padding_bytes = _get_next_multiple(loop_frame_offset, 2048) - loop_frame_offset
        padding_frames = padding_bytes // info.frame_size
        info.encoder_delay += padding_frames * SAMPLES_PER_FRAME
        info.loop_start_frame += padding_frames
        info.loop_end_frame += padding_frames
        info.header_size += padding_bytes % info.frame_size

    total_samples = input_sample_count + info.encoder_delay
    info.frame_count = _div_round_up(total_samples, SAMPLES_PER_FRAME)
    info.encoder_padding = (info.frame_count * SAMPLES_PER_FRAME
                            - info.encoder_delay - input_sample_count)
    info.init_derived()
    return EncConfig(info=info, post_samples=post_samples,
                     buffer_pre_samples=info.encoder_delay - 128,
                     sample_count_per_channel=sample_count_per_channel,
                     input_sample_count=input_sample_count,
                     hfr_band_count=hfr_band_count)


def build_timeline(cfg: EncConfig, wav: wavmod.WavFile) -> np.ndarray:
    """Reproduce the streaming buffer feed (hca.cpp:2990-3107) as one array.

    Returns int16 [channels, frame_count * 1024].
    """
    info = cfg.info
    C = info.channels
    total = info.frame_count * SAMPLES_PER_FRAME
    per_ch = wav.pcm16.reshape(-1, C).T  # [C, samples]
    timeline = np.zeros((C, total), dtype=np.int16)

    pre = cfg.buffer_pre_samples
    # lead frames of silence while pre > 1024
    nlead = 0
    while pre > SAMPLES_PER_FRAME:
        nlead += 1
        pre -= SAMPLES_PER_FRAME
    pos = nlead * SAMPLES_PER_FRAME
    # remaining pre samples replicate the first input sample (hca.cpp:3007-3009)
    if pre > 0 and per_ch.shape[1] > 0:
        timeline[:, pos:pos + pre] = per_ch[:, 0:1]
    pos += pre
    # main audio (clamped to sample_count_per_channel for loops)
    scc = min(cfg.sample_count_per_channel, per_ch.shape[1])
    timeline[:, pos:pos + scc] = per_ch[:, :scc]
    pos += scc
    # post audio: loop region replay (or silence when not looping).
    # SaveLoopAudio (hca.cpp:3015-3026) accrues the loop window from the
    # encoder's 1024-sample input chunks and stops accruing the moment main
    # audio exhausts — EncodePostAudio runs inside the same iteration — so
    # the captured window ends at the 1024 boundary of the chunk where
    # sample_count_per_channel falls; the PostAudio buffer's remaining
    # samples stay zero even when the input continues past that boundary.
    if info.loop_flag and cfg.post_samples > 0:
        loop_start_sample = (info.loop_start_frame * SAMPLES_PER_FRAME
                             + info.loop_start_delay - info.encoder_delay)
        chunk_end = ((max(cfg.sample_count_per_channel, 1) - 1)
                     // SAMPLES_PER_FRAME + 1) * SAMPLES_PER_FRAME
        src_end = min(loop_start_sample + cfg.post_samples, chunk_end,
                      per_ch.shape[1])
        src = per_ch[:, loop_start_sample:src_end]
        n = min(src.shape[1], total - pos)
        timeline[:, pos:pos + n] = src[:, :n]
    return timeline


# ---------------------------------------------------------------------------
# MDCT
# ---------------------------------------------------------------------------

def run_mdct(timeline: np.ndarray) -> np.ndarray:
    """PCM16 [C, F*1024] -> spectra f32 [F, C, 8, 128].

    Mirrors PcmToFloat + mdct_transform + DCT4 (hca.cpp:2470-2559) with exact
    fp32 op order; the inter-subframe overlap is a one-step shift. Prefers
    the C++ panel implementation (cricore.cpp::cri_hca_mdct, bit-identical);
    numpy fallback below.
    """
    native_out = _run_mdct_native(timeline)
    if native_out is not None:
        return native_out
    C, total = timeline.shape
    Tn = total // 128
    wave = (timeline.astype(f32) * f32(1.0 / 32768.0)).astype(f32)
    wave = wave.reshape(C, Tn, 128)
    w = T.IMDCT_WINDOW
    half = 64

    prev = np.concatenate(
        [np.zeros((C, 1, 128), dtype=f32), wave[:, :-1, :]], axis=1)
    a = (np.flip(w[:half]) * (-wave[:, :, half:])).astype(f32)
    b = ((-w[half:]) * np.flip(wave[:, :, :half], axis=-1)).astype(f32)
    sc_first = (a - b).astype(f32)
    c = (w[:half] * prev[:, :, :half]).astype(f32)
    d = ((-np.flip(w[half:])) * np.flip(prev[:, :, half:], axis=-1)).astype(f32)
    sc_second = (c - d).astype(f32)
    scratch = np.concatenate([sc_first, sc_second], axis=-1)  # [C, T, 128]

    spectra = dct4(scratch)
    F = Tn // SUBFRAMES
    return np.moveaxis(spectra.reshape(C, F, 8, 128), 0, 1)


def _run_mdct_native(timeline: np.ndarray):
    import ctypes

    from .. import native
    lib = native.load()
    if lib is None:
        return None
    C, total = timeline.shape
    F = total // 1024
    timeline = np.ascontiguousarray(timeline, dtype=np.int16)
    out = np.empty((F, C, 8, 128), dtype=f32)
    if F == 0:
        return out
    win = np.ascontiguousarray(T.IMDCT_WINDOW, f32)
    dsin = np.ascontiguousarray(T.DCT4_SIN_FLAT, f32)
    dcos = np.ascontiguousarray(T.DCT4_COS_FLAT, f32)
    shuf = np.ascontiguousarray(T.SHUFFLE_TABLE, np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.cri_hca_mdct(
        timeline.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        np.int32(C), np.int32(F),
        win.ctypes.data_as(f32p), dsin.ctypes.data_as(f32p),
        dcos.ctypes.data_as(f32p),
        shuf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(f32p))
    return out


def dct4(x: np.ndarray) -> np.ndarray:
    """DCT-IV over the last axis (128), exact order of hca.cpp:2481-2527."""
    shape = x.shape
    sin7, cos7 = T.dct4_stage_tables(7)
    half = 64
    idx = np.arange(half)
    a = x[..., 2 * idx]
    b = x[..., 127 - 2 * idx]
    even = ((a * cos7[:half]).astype(f32) + (b * sin7[:half]).astype(f32)).astype(f32)
    odd = ((a * sin7[:half]).astype(f32) - (b * cos7[:half]).astype(f32)).astype(f32)
    temp = np.empty_like(x)
    temp[..., 0::2] = even
    temp[..., 1::2] = odd

    for stage in range(6):  # stageCount = MDCT_BITS - 1
        block_count = 1 << stage
        bs_bits = 6 - stage
        bhs_bits = bs_bits - 1
        bs = 1 << bs_bits
        bhs = 1 << bhs_bits
        sin, cos = T.dct4_stage_tables(bhs_bits)
        g = temp.reshape(*shape[:-1], block_count, 2, bhs, 2)
        fe = g[..., 0, :, 0].copy()
        fo = g[..., 0, :, 1].copy()
        be = g[..., 1, :, 0].copy()
        bo = g[..., 1, :, 1].copy()
        a2 = (fe - be).astype(f32)
        b2 = (fo - bo).astype(f32)
        g[..., 0, :, 0] = (fe + be).astype(f32)
        g[..., 0, :, 1] = (fo + bo).astype(f32)
        g[..., 1, :, 0] = ((a2 * cos).astype(f32) + (b2 * sin).astype(f32)).astype(f32)
        g[..., 1, :, 1] = ((a2 * sin).astype(f32) - (b2 * cos).astype(f32)).astype(f32)
        del bs  # layout bookkeeping only

    out = temp[..., T.SHUFFLE_TABLE]
    return (out * f32(0.125)).astype(f32)


# ---------------------------------------------------------------------------
# Per-frame quantisation stages (vectorised over the frame axis F)
# ---------------------------------------------------------------------------

def encode_intensity_stereo(info, spectra, intensity):
    """EncodeIntensityStereo (hca.cpp:2561-2609); mutates spectra/intensity.

    spectra [F, C, 8, 128], intensity u8 [F, C, 8].
    """
    if info.stereo_band_count <= 0:
        return
    lib = _native_lib()
    if lib is not None and spectra.flags.c_contiguous \
            and spectra.dtype == f32 and spectra.shape[0] > 0:
        ctype = np.ascontiguousarray(info.channel_type, dtype=np.uint8)
        bounds = np.ascontiguousarray(T.INTENSITY_RATIO_BOUNDS, f32)
        lib.cri_hca_intensity_stereo(
            _f32p(spectra), _u8p(intensity),
            np.int32(spectra.shape[0]), np.int32(info.channels),
            np.int32(info.base_band_count), np.int32(info.total_band_count),
            _u8p(ctype), np.int32(T.STEREO_PRIMARY), _f32p(bounds))
        return
    F = spectra.shape[0]
    bounds = T.INTENSITY_RATIO_BOUNDS
    sqrt2_2 = math.sqrt(2) / 2
    for c in range(info.channels):
        if info.channel_type[c] != T.STEREO_PRIMARY:
            continue
        l = spectra[:, c]       # [F, 8, 128]
        r = spectra[:, c + 1]
        e_l = np.zeros((F, 8), dtype=f32)
        e_r = np.zeros((F, 8), dtype=f32)
        e_t = np.zeros((F, 8), dtype=f32)
        for band in range(info.base_band_count, info.total_band_count):
            e_l = (e_l + np.abs(l[:, :, band])).astype(f32)
            e_r = (e_r + np.abs(r[:, :, band])).astype(f32)
            e_t = (e_t + np.abs((l[:, :, band] + r[:, :, band]).astype(f32))).astype(f32)
        e_t = (e_t * f32(2.0)).astype(f32)
        e_lr = (e_r + e_l).astype(f32)
        with np.errstate(divide="ignore", invalid="ignore"):
            stored = ((f32(2.0) * e_l).astype(f32) / e_lr).astype(f32)
            ratio = (e_lr / e_t).astype(f32)
        ratio = np.where(ratio.astype(f64) < 0.5, f32(0.5), ratio)
        ratio = np.where(ratio.astype(f64) > sqrt2_2, f32(sqrt2_2), ratio)
        # quantised index: first k in [1,13) with bounds[k] < stored, else 13
        with np.errstate(invalid="ignore"):
            quant = 1 + (bounds[1:13][None, None, :] >= stored[:, :, None]).sum(axis=-1)
        has_energy = (e_r > 0) | (e_l > 0)
        quant = np.where(has_energy, quant, 0)
        ratio = np.where(has_energy, ratio, f32(1.0))
        intensity[:, c + 1, :] = quant.astype(np.uint8)
        sel = slice(info.base_band_count, info.total_band_count)
        l[:, :, sel] = ((l[:, :, sel] + r[:, :, sel]).astype(f32)
                        * ratio[:, :, None]).astype(f32)
        r[:, :, sel] = 0.0


def find_scale_factor(values: np.ndarray) -> np.ndarray:
    """Vectorised FindScaleFactor (hca.cpp:2611-2623)."""
    idx = np.searchsorted(T.SCALING_TABLE, values.astype(f32), side="right")
    return np.minimum(idx, 63).astype(np.int32)


def calc_scalefactors(info, spectra):
    """[F, C, 8, 128] -> scalefactors int32 [F, C, 128]."""
    peak = np.abs(spectra).max(axis=2)  # [F, C, 128]
    sf = find_scale_factor(peak)
    for c in range(info.channels):
        sf[:, c, info.coded_count[c]:] = 0
    return sf


def scale_spectra(info, spectra, sf):
    """ScaleSpectra (hca.cpp:2639-2654) -> scaled f32 [F, C, 8, 128]."""
    qs = T.QUANTIZER_SCALING_TABLE[sf]  # [F, C, 128]
    ans = (spectra * qs[:, :, None, :]).astype(f32)
    lim = f32(0.9999999)
    ans = np.where(ans > lim, lim, ans)
    ans = np.where(ans < -lim, -lim, ans)
    ans = np.where((sf == 0)[:, :, None, :], f32(0.0), ans)
    for c in range(info.channels):
        ans[:, c, :, info.coded_count[c]:] = 0.0
    return ans


def calc_hfr_scales(info, cfg, spectra, scaled, sf):
    """HFR group averages + scales (hca.cpp:2656-2706). [F, C, groups] i32."""
    F = spectra.shape[0]
    G = info.hfr_group_count
    hfr_scales = np.zeros((F, info.channels, max(G, 1)), dtype=np.int32)
    if G == 0:
        return hfr_scales
    start = info.stereo_band_count + info.base_band_count
    bpg = info.bands_per_hfr_group
    hfr_band_count = min(cfg.hfr_band_count,
                         info.total_band_count - cfg.hfr_band_count)
    for c in range(info.channels):
        if info.channel_type[c] == T.STEREO_SECONDARY:
            continue
        # group averages over |spectra| (band-major, subframe-minor order)
        band = start
        for g in range(G):
            acc = np.zeros(F, dtype=f32)
            count = 0
            for _ in range(bpg):
                if band >= 128:
                    break
                for s in range(8):
                    acc = (acc + np.abs(spectra[:, c, s, band])).astype(f32)
                count += 8
                band += 1
            avg = (acc / f32(count)).astype(f32) if count else np.zeros(F, dtype=f32)
            if g == 0:
                group_avg = np.zeros((F, G), dtype=f32)
            group_avg[:, g] = avg
        # scaled-spectra normalisation (hca.cpp:2689-2704)
        band = 0
        for g in range(G):
            acc = np.zeros(F, dtype=f32)
            count = 0
            for _ in range(bpg):
                if band >= hfr_band_count:
                    break
                src = start - band - 1
                for s in range(8):
                    acc = (acc + np.abs(scaled[:, c, s, src])).astype(f32)
                count += 8
                band += 1
            if count:
                avg = (acc / f32(count)).astype(f32)
                factor = np.minimum(1.0 / np.maximum(avg.astype(f64), 1e-300),
                                    math.sqrt(2))
                gs = group_avg[:, g].astype(f64)
                upd = (gs * factor).astype(f32)
                mask = avg.astype(f64) > 0.0
                group_avg[:, g] = np.where(mask, upd, group_avg[:, g])
            hfr_scales[:, c, g] = find_scale_factor(group_avg[:, g])
    return hfr_scales


def calc_delta_lengths(info, sf):
    """CalculateOptimalDeltaLength + frame header length (hca.cpp:2708-2750).

    sf [F, C, 128] -> (delta_bits [F, C], header_len_bits [F, C]) int32.
    """
    F = sf.shape[0]
    delta_bits = np.zeros((F, info.channels), dtype=np.int32)
    header_len = np.zeros((F, info.channels), dtype=np.int32)
    for c in range(info.channels):
        cc = int(info.coded_count[c])
        s = sf[:, c, :cc].astype(np.int64)
        empty = (s == 0).all(axis=1)
        min_len = np.full(F, 3 + 6 * cc, dtype=np.int64)
        min_bits = np.full(F, 6, dtype=np.int64)
        deltas = np.abs(np.diff(s, axis=1))
        for db in range(1, 6):
            max_delta = (1 << (db - 1)) - 1
            length = 3 + 6 + np.where(deltas > max_delta, db + 6, db).sum(axis=1)
            upd = length < min_len
            min_len = np.where(upd, length, min_len)
            min_bits = np.where(upd, db, min_bits)
        dbv = np.where(empty, 0, min_bits)
        hlv = np.where(empty, 3, min_len)
        if info.channel_type[c] == T.STEREO_SECONDARY:
            hlv = hlv + 32
        elif info.hfr_group_count > 0:
            hlv = hlv + 6 * info.hfr_group_count
        delta_bits[:, c] = dbv
        header_len[:, c] = hlv
    return delta_bits, header_len


def calc_resolution_enc(sf, noise):
    """CalculateResolution (hca.cpp:2752-2761); sf/noise int arrays."""
    curve = noise - (5 * sf) // 2 + 2
    curve = np.clip(curve, 0, 58)
    res = T.SCALE_TO_RESOLUTION_CURVE[curve].astype(np.int32)
    return np.where(sf == 0, 0, res)


def calc_used_bits(info, sf, scaled, header_len, noise_level, eval_boundary):
    """CalculateUsedBits (hca.cpp:2763-2790), vectorised over frames.

    sf [F, C, 128] int, scaled [F, C, 8, 128] f32, header_len [F, C],
    noise_level [F] int, eval_boundary [F] int -> [F] int64.
    """
    F = sf.shape[0]
    length = np.full(F, 16 + 16 + 16, dtype=np.int64)
    band = np.arange(128)
    for c in range(info.channels):
        cc = int(info.coded_count[c])
        length += header_len[:, c]
        noise = np.where(band[None, :cc] < eval_boundary[:, None],
                         noise_level[:, None] - 1, noise_level[:, None])
        res = calc_resolution_enc(sf[:, c, :cc].astype(np.int64), noise)  # [F, cc]
        sc = scaled[:, c, :, :cc]  # [F, 8, cc]
        # resolution >= 8 path
        hi = res >= 8
        bits_hi = (T.QUANTIZED_SPECTRUM_MAX_BITS[np.clip(res, 0, 15)].astype(np.int64) - 1)
        dead = T.QUANTIZER_DEAD_ZONE[np.clip(res, 0, 15)]
        extra = (np.abs(sc) >= dead[:, None, :]).sum(axis=1)  # [F, cc]
        cost_hi = 8 * bits_hi + extra
        # resolution < 8 path
        ssi = T.QUANTIZER_INVERSE_STEP_SIZE[np.clip(res, 0, 15)]
        shift_up = (ssi + f32(1.0)).astype(f32)
        shift_down = np.trunc(ssi.astype(f64) + 0.5 - 8).astype(np.int64)
        q = np.trunc((sc * ssi[:, None, :]).astype(f32)
                     + shift_up[:, None, :]).astype(np.int64) - shift_down[:, None, :]
        qbits = T.QUANTIZE_SPECTRUM_BITS[
            np.clip(res, 0, 7)[:, None, :], np.clip(q, 0, 15)].astype(np.int64)
        cost_lo = qbits.sum(axis=1)
        length += np.where(hi, cost_hi, cost_lo).sum(axis=1)
    return length


def binary_search_level(info, sf, scaled, header_len, avail):
    """BinarySearchLevel over 0..255 per frame (hca.cpp:2792-2807). [F] i32."""
    F = sf.shape[0]
    low = np.zeros(F, dtype=np.int64)
    high = np.full(F, 255, dtype=np.int64)
    mid_value = np.zeros(F, dtype=np.int64)
    zero_eval = np.zeros(F, dtype=np.int64)
    while True:
        active = low != high
        if not active.any():
            break
        mid = (low + high) // 2
        mv = calc_used_bits(info, sf, scaled, header_len, mid, zero_eval)
        mid_value = np.where(active, mv, mid_value)
        go_up = active & (mv > avail)
        low = np.where(go_up, mid + 1, low)
        high = np.where(active & ~go_up, mid, high)
    fail = (low == 255) & (mid_value > avail)
    return np.where(fail, -1, low).astype(np.int32)


def binary_search_boundary(info, sf, scaled, header_len, avail, noise_level):
    """BinarySearchBoundary 0..127 per frame (hca.cpp:2834-2850). [F] i32."""
    F = sf.shape[0]
    low = np.zeros(F, dtype=np.int64)
    high = np.full(F, 127, dtype=np.int64)
    nl = noise_level.astype(np.int64)
    while True:
        active = np.abs(high - low) > 1
        if not active.any():
            break
        mid = (low + high) // 2
        mv = calc_used_bits(info, sf, scaled, header_len, nl, mid)
        over = active & (avail < mv)
        high = np.where(over, mid - 1, high)
        low = np.where(active & ~over, mid, low)
    # final adjustment
    eq = low == high
    res = np.where(eq, np.where(low < 127, low, -1), 0)
    neq = ~eq
    if neq.any():
        hi_val = calc_used_bits(info, sf, scaled, header_len, nl, high)
        res = np.where(neq, np.where(hi_val > avail, low, high), res)
    return res.astype(np.int32)


def quantize_spectra(info, scaled, resolutions):
    """QuantizeSpectra (hca.cpp:2878-2892) -> int [F, C, 8, 128]."""
    res = resolutions.astype(np.int64)
    ssi = T.QUANTIZER_INVERSE_STEP_SIZE[np.clip(res, 0, 15)]
    shift_up = (ssi + f32(1.0)).astype(f32)
    shift_down = np.trunc(ssi.astype(f64) + 0.5).astype(np.int64)
    q = np.trunc((scaled * ssi[:, :, None, :]).astype(f32)
                 + shift_up[:, :, None, :]).astype(np.int64) \
        - shift_down[:, :, None, :]
    for c in range(info.channels):
        q[:, c, :, info.coded_count[c]:] = 0
    return q


def _native_lib():
    from .. import native
    return native.load()


def _i32p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _scalefactors_scale_native(info, spectra):
    """C++ fused calc_scalefactors + scale_spectra; None if unavailable."""
    lib = _native_lib()
    if lib is None or spectra.shape[0] == 0:
        return None
    import ctypes
    spectra = np.ascontiguousarray(spectra, dtype=f32)
    F, C = spectra.shape[0], spectra.shape[1]
    sf = np.empty((F, C, 128), dtype=np.int32)
    scaled = np.empty((F, C, 8, 128), dtype=f32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    scaling = np.ascontiguousarray(T.SCALING_TABLE, f32)
    qscaling = np.ascontiguousarray(T.QUANTIZER_SCALING_TABLE, f32)
    lib.cri_hca_scalefactors_scale(
        _f32p(spectra), np.int32(F), np.int32(C), _i32p(coded),
        _f32p(scaling), _f32p(qscaling), ctypes.c_float(f32(0.9999999)),
        _i32p(sf), _f32p(scaled))
    return sf, scaled


def _resolution_quantize_native(info, sf, scaled, level, boundary):
    """C++ fused calc_resolution_enc + quantize_spectra; None if absent."""
    lib = _native_lib()
    if lib is None or sf.shape[0] == 0:
        return None
    scaled = np.ascontiguousarray(scaled, dtype=f32)
    F, C = sf.shape[0], sf.shape[1]
    res = np.empty((F, C, 128), dtype=np.int32)
    q = np.empty((F, C, 8, 128), dtype=np.int32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    curve = np.ascontiguousarray(T.SCALE_TO_RESOLUTION_CURVE, np.uint8)
    ssi = np.ascontiguousarray(T.QUANTIZER_INVERSE_STEP_SIZE, f32)
    level = np.ascontiguousarray(level, dtype=np.int32)
    boundary = np.ascontiguousarray(boundary, dtype=np.int32)
    lib.cri_hca_resolution_quantize(
        _i32p(np.ascontiguousarray(sf, dtype=np.int32)), _f32p(scaled),
        _i32p(level), _i32p(boundary), np.int32(F), np.int32(C),
        _i32p(coded), _u8p(curve), _f32p(ssi), _i32p(res), _i32p(q))
    return res, q


def _delta_lengths_native(info, sf):
    lib = _native_lib()
    if lib is None or sf.shape[0] == 0:
        return None
    F, C = sf.shape[0], sf.shape[1]
    db = np.empty((F, C), dtype=np.int32)
    hl = np.empty((F, C), dtype=np.int32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    ctype = np.ascontiguousarray(info.channel_type, dtype=np.uint8)
    lib.cri_hca_delta_lengths(
        _i32p(np.ascontiguousarray(sf, dtype=np.int32)), np.int32(F),
        np.int32(C), _i32p(coded), _u8p(ctype), np.int32(T.STEREO_SECONDARY),
        np.int32(info.hfr_group_count), _i32p(db), _i32p(hl))
    return db, hl


def _search_levels_native(info, sf, scaled, delta_bits, header_len, avail):
    """C++ per-frame rate-control (cricore.cpp::cri_hca_search_levels).

    Mutates sf/delta_bits/header_len in place exactly like the numpy
    fallback path; returns (level, boundary) or None when unavailable.
    """
    import ctypes

    from .. import native
    lib = native.load()
    if lib is None or sf.shape[0] == 0:
        return None
    assert sf.dtype == np.int32 and sf.flags.c_contiguous
    scaled = np.ascontiguousarray(scaled, dtype=f32)
    assert delta_bits.dtype == np.int32 and header_len.dtype == np.int32
    F, C = sf.shape[0], sf.shape[1]
    level = np.zeros(F, dtype=np.int32)
    boundary = np.zeros(F, dtype=np.int32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    ctype = np.ascontiguousarray(info.channel_type, dtype=np.uint8)
    tables = [np.ascontiguousarray(T.SCALE_TO_RESOLUTION_CURVE, np.uint8),
              np.ascontiguousarray(T.QUANTIZED_SPECTRUM_MAX_BITS, np.uint8),
              np.ascontiguousarray(T.QUANTIZER_DEAD_ZONE, f32),
              np.ascontiguousarray(T.QUANTIZER_INVERSE_STEP_SIZE, f32),
              np.ascontiguousarray(T.QUANTIZE_SPECTRUM_BITS, np.uint8)]
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)

    def ptr(a):
        return a.ctypes.data_as(
            f32p if a.dtype == np.float32 else
            (u8p if a.dtype == np.uint8 else i32p))

    rc = lib.cri_hca_search_levels(
        ptr(sf), ptr(scaled), ptr(delta_bits), ptr(header_len),
        np.int32(F), np.int32(C), np.int64(avail),
        ptr(coded), ptr(ctype), np.int32(T.STEREO_SECONDARY),
        np.int32(info.hfr_group_count), np.int32(info.base_band_count),
        np.int32(info.stereo_band_count),
        *(ptr(t) for t in tables),
        ptr(level), ptr(boundary), np.int32(0))
    if rc != 0:
        raise hca_frame.HcaError("Unknown Encoding error.")
    return level, boundary


def pack_header(info: hca_frame.HcaInfo) -> bytes:
    """PackHeader (hca.cpp:3109-3164): HCA v2.0 header bytes."""
    out = bytearray(info.header_size)
    out[0:4] = b"HCA\x00"
    out[4:6] = (0x0200).to_bytes(2, "big")
    out[6:8] = info.header_size.to_bytes(2, "big")
    out[8:12] = b"fmt\x00"
    out[12:16] = info.sample_rate.to_bytes(4, "big")
    out[12] = info.channels
    out[16:20] = info.frame_count.to_bytes(4, "big")
    out[20:22] = (info.encoder_delay & 0xFFFF).to_bytes(2, "big")
    out[22:24] = (info.encoder_padding & 0xFFFF).to_bytes(2, "big")
    out[24:28] = b"comp"
    out[28:30] = info.frame_size.to_bytes(2, "big")
    out[30] = info.min_resolution
    out[31] = info.max_resolution
    out[32] = info.track_count
    out[33] = info.channel_config
    out[34] = info.total_band_count
    out[35] = info.base_band_count
    out[36] = info.stereo_band_count
    out[37] = info.bands_per_hfr_group
    pos = 40
    if info.loop_flag:
        out[40:44] = b"loop"
        out[44:48] = info.loop_start_frame.to_bytes(4, "big")
        out[48:52] = info.loop_end_frame.to_bytes(4, "big")
        out[52:54] = info.loop_start_delay.to_bytes(2, "big")
        out[54:56] = info.loop_end_padding.to_bytes(2, "big")
        pos = 56
    out[pos:pos + 4] = b"ciph"
    out[pos + 4:pos + 6] = b"\x00\x00"
    pos += 6
    out[pos:pos + 4] = b"pad\x00"
    crc = crc16(bytes(out[:info.header_size - 2]))
    out[info.header_size - 2:] = crc.to_bytes(2, "big")
    return bytes(out)


def encode(wav_bytes: bytes, force_not_looping: bool = False,
           quality: int = 1) -> bytes:
    """WAV -> HCA v2.0, byte-parity with CriCodecs.HcaEncode."""
    wav = wavmod.parse_wav(bytes(wav_bytes))
    loop_flag = wav.looping and not force_not_looping
    cfg = init_encode(wav, quality, loop_flag)
    info = cfg.info
    F = info.frame_count
    C = info.channels

    timeline = build_timeline(cfg, wav)
    spectra = run_mdct(timeline)                     # [F, C, 8, 128]
    intensity = np.zeros((F, C, 8), dtype=np.uint8)
    encode_intensity_stereo(info, spectra, intensity)
    ss = _scalefactors_scale_native(info, spectra)
    if ss is not None:
        sf, scaled = ss
    else:
        sf = calc_scalefactors(info, spectra)        # [F, C, 128]
        scaled = scale_spectra(info, spectra, sf)
    hfr_scales = calc_hfr_scales(info, cfg, spectra, scaled, sf)
    dl = _delta_lengths_native(info, sf)
    if dl is not None:
        delta_bits, header_len = dl
    else:
        delta_bits, header_len = calc_delta_lengths(info, sf)

    avail = np.int64(info.frame_size * 8)
    searched = _search_levels_native(info, sf, scaled, delta_bits,
                                     header_len, avail)
    if searched is not None:
        level, boundary = searched
    else:
        level = binary_search_level(info, sf, scaled, header_len, avail)

        # fallback: zero top bands until the frame fits (hca.cpp:2816-2828)
        if (level < 0).any():
            for fidx in np.nonzero(level < 0)[0]:
                highest = info.base_band_count + info.stereo_band_count - 1
                while level[fidx] < 0:
                    highest -= 2
                    if highest < 0:
                        raise hca_frame.HcaError("Unknown Encoding error.")
                    sf[fidx, :, highest + 1] = 0
                    sf[fidx, :, highest + 2] = 0
                    db1, hl1 = calc_delta_lengths(info, sf[fidx:fidx + 1])
                    delta_bits[fidx] = db1[0]
                    header_len[fidx] = hl1[0]
                    level[fidx] = binary_search_level(
                        info, sf[fidx:fidx + 1], scaled[fidx:fidx + 1],
                        header_len[fidx:fidx + 1], avail)[0]

        # evaluation boundary (hca.cpp:2852-2866)
        boundary = np.zeros(F, dtype=np.int32)
        nz = level != 0
        if nz.any():
            b = binary_search_boundary(info, sf[nz], scaled[nz],
                                       header_len[nz], avail, level[nz])
            if (b < 0).any():
                raise hca_frame.HcaError("Unknown Encoding error.")
            boundary[nz] = b

    # resolutions (hca.cpp:2868-2876) + quantisation
    rq = _resolution_quantize_native(info, sf, scaled, level, boundary)
    if rq is not None:
        resolutions, quantized = rq
    else:
        band = np.arange(128)
        noise = np.where(band[None, None, :] < boundary[:, None, None],
                         level[:, None, None] - 1, level[:, None, None])
        resolutions = calc_resolution_enc(sf.astype(np.int64), noise)
        for c in range(C):
            resolutions[:, c, info.coded_count[c]:] = 0
        quantized = quantize_spectra(info, scaled, resolutions)

    packed = hca_frame.pack_frames_native(
        info, level, boundary, sf, resolutions, intensity, hfr_scales,
        delta_bits, quantized)
    if packed is None:
        frames = bytearray()
        for fidx in range(F):
            frames += hca_frame.pack_frame(
                info, int(level[fidx]), int(boundary[fidx]),
                sf[fidx], resolutions[fidx], intensity[fidx],
                hfr_scales[fidx], delta_bits[fidx], quantized[fidx])
        packed = bytes(frames)
    return pack_header(info) + packed
