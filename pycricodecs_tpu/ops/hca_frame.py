"""HCA host bitstream front-end: header parse, frame unpack, frame pack.

This is the serial half of the codec (SURVEY.md §7.1 L1): variable-length
bitstreams are decoded/encoded host-side into dense SoA tensors which the
device kernels (ops/hca_kernels.py) consume/produce. Behaviour parity:
clHCA_DecodeHeader (hca.cpp:628-984), clHCA_DecodeBlock_unpack
(hca.cpp:1149-1205) and PackFrame (hca.cpp:2894-2963).

This module is the pure-Python reference path; the C++ core in
native/cricore.cpp implements the same layout for throughput.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..utils.bitio import BitReader, BitWriter
from ..utils import crc
from ..utils.crc import crc16
from ..utils import hca_crypt
from . import hca_tables as T

# contiguous copies of the constant decode tables, marshalled once (the
# ctypes wrappers sit on the per-file hot path)
_INVERT_U8 = np.ascontiguousarray(T.INVERT_TABLE, dtype=np.uint8)
_MAX_BIT_U8 = np.ascontiguousarray(T.MAX_BIT_TABLE, dtype=np.uint8)
_READ_BIT_U8 = np.ascontiguousarray(T.READ_BIT_TABLE, dtype=np.uint8)
_READ_VAL_I8 = np.ascontiguousarray(T.READ_VAL_TABLE, dtype=np.int8)

HCA_MASK = 0x7F7F7F7F

VERSION_V101 = 0x0101
VERSION_V200 = 0x0200
VERSION_V300 = 0x0300


class HcaError(ValueError):
    pass


@dataclass
class HcaInfo:
    version: int = 0
    header_size: int = 0
    channels: int = 0
    sample_rate: int = 0
    frame_count: int = 0
    encoder_delay: int = 0
    encoder_padding: int = 0
    frame_size: int = 0
    min_resolution: int = 1
    max_resolution: int = 15
    track_count: int = 1
    channel_config: int = 0
    stereo_type: int = 0
    total_band_count: int = 0
    base_band_count: int = 0
    stereo_band_count: int = 0
    bands_per_hfr_group: int = 0
    ms_stereo: int = 0
    vbr_max_frame_size: int = 0
    vbr_noise_level: int = 0
    ath_type: int = 0
    loop_flag: bool = False
    loop_start_frame: int = 0
    loop_end_frame: int = 0
    loop_start_delay: int = 0
    loop_end_padding: int = 0
    ciph_type: int = 0
    rva_volume: float = 1.0
    comment: str = ""
    hfr_group_count: int = 0
    keycode: int = 0

    # derived
    channel_type: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.uint8))
    coded_count: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int32))
    ath: np.ndarray = field(default_factory=lambda: np.zeros(128, dtype=np.uint8))
    cipher: np.ndarray = field(default_factory=lambda: np.arange(256, dtype=np.uint8))

    def init_derived(self) -> None:
        self.channel_type = T.channel_types(
            self.channels, self.track_count, self.stereo_band_count,
            self.channel_config)
        self.coded_count = np.where(
            self.channel_type == T.STEREO_SECONDARY,
            self.base_band_count,
            self.base_band_count + self.stereo_band_count).astype(np.int32)
        self.ath = T.ath_curve(self.ath_type, self.sample_rate)
        self.cipher = hca_crypt.cipher_table(self.ciph_type, self.keycode)

    def set_key(self, keycode: int) -> None:
        self.keycode = keycode
        self.cipher = hca_crypt.cipher_table(self.ciph_type, keycode)


def _ceil2(a: int, b: int) -> int:
    return (a // b + (1 if a % b else 0)) if b >= 1 else 0


def parse_header(data: bytes) -> HcaInfo:
    if len(data) < 8:
        raise HcaError("Header too small")
    br = BitReader(data)
    info = HcaInfo()

    if (br.peek(32) & HCA_MASK) != 0x48434100:
        raise HcaError("Not an HCA header")
    br.skip(32)
    info.version = br.read(16)
    info.header_size = br.read(16)
    if info.version not in (0x0101, 0x0102, 0x0103, 0x0200, 0x0300):
        raise HcaError("Unknown HCA version")
    if len(data) < info.header_size:
        raise HcaError("Truncated header")
    if crc16(data[:info.header_size]):
        raise HcaError("Header checksum mismatch")
    size = info.header_size - 8

    if size >= 0x10 and (br.peek(32) & HCA_MASK) == 0x666D7400:  # fmt
        br.skip(32)
        info.channels = br.read(8)
        info.sample_rate = br.read(24)
        info.frame_count = br.read(32)
        info.encoder_delay = br.read(16)
        info.encoder_padding = br.read(16)
        if not (1 <= info.channels <= 16) or info.frame_count == 0 \
                or not (1 <= info.sample_rate <= 0x7FFFFF):
            raise HcaError("Bad fmt chunk")
        size -= 0x10
    else:
        raise HcaError("Missing fmt chunk")

    if size >= 0x10 and (br.peek(32) & HCA_MASK) == 0x636F6D70:  # comp
        br.skip(32)
        info.frame_size = br.read(16)
        info.min_resolution = br.read(8)
        info.max_resolution = br.read(8)
        info.track_count = br.read(8)
        info.channel_config = br.read(8)
        info.total_band_count = br.read(8)
        info.base_band_count = br.read(8)
        info.stereo_band_count = br.read(8)
        info.bands_per_hfr_group = br.read(8)
        info.ms_stereo = br.read(8)
        br.read(8)
        size -= 0x10
    elif size >= 0x0C and (br.peek(32) & HCA_MASK) == 0x64656300:  # dec
        br.skip(32)
        info.frame_size = br.read(16)
        info.min_resolution = br.read(8)
        info.max_resolution = br.read(8)
        info.total_band_count = br.read(8) + 1
        info.base_band_count = br.read(8) + 1
        info.track_count = br.read(4)
        info.channel_config = br.read(4)
        info.stereo_type = br.read(8)
        if info.stereo_type == 0:
            info.base_band_count = info.total_band_count
        info.stereo_band_count = info.total_band_count - info.base_band_count
        info.bands_per_hfr_group = 0
        size -= 0x0C
    else:
        raise HcaError("Missing comp/dec chunk")

    if size >= 0x08 and (br.peek(32) & HCA_MASK) == 0x76627200:  # vbr
        br.skip(32)
        info.vbr_max_frame_size = br.read(16)
        info.vbr_noise_level = br.read(16)
        if not (info.frame_size == 0 and 8 < info.vbr_max_frame_size <= 0x1FF):
            raise HcaError("Bad vbr chunk")
        size -= 0x08

    if size >= 0x06 and (br.peek(32) & HCA_MASK) == 0x61746800:  # ath
        br.skip(32)
        info.ath_type = br.read(16)
    else:
        info.ath_type = 1 if info.version < VERSION_V200 else 0

    if size >= 0x10 and (br.peek(32) & HCA_MASK) == 0x6C6F6F70:  # loop
        br.skip(32)
        info.loop_start_frame = br.read(32)
        info.loop_end_frame = br.read(32)
        info.loop_start_delay = br.read(16)
        info.loop_end_padding = br.read(16)
        info.loop_flag = True
        if not (info.loop_start_frame <= info.loop_end_frame < info.frame_count):
            raise HcaError("Bad loop chunk")
        size -= 0x10

    if size >= 0x06 and (br.peek(32) & HCA_MASK) == 0x63697068:  # ciph
        br.skip(32)
        info.ciph_type = br.read(16)
        if info.ciph_type not in (0, 1, 56):
            raise HcaError("Bad cipher type")
        size -= 0x06

    if size >= 0x08 and (br.peek(32) & HCA_MASK) == 0x72766100:  # rva
        br.skip(32)
        info.rva_volume = np.frombuffer(
            np.uint32(br.read(32)).tobytes(), dtype=np.float32)[0]
        size -= 0x08

    if size >= 0x05 and (br.peek(32) & HCA_MASK) == 0x636F6D6D:  # comm
        br.skip(32)
        clen = br.read(8)
        if clen > size:
            raise HcaError("Bad comment chunk")
        info.comment = bytes(br.read(8) for _ in range(clen)).decode(
            "utf-8", errors="replace")
        size -= 0x05 + clen

    # validations (hca.cpp:842-977)
    if not (0x08 <= info.frame_size <= 0xFFFF):
        raise HcaError("Bad frame size")
    if info.version <= VERSION_V200:
        if info.min_resolution != 1 or info.max_resolution != 15:
            raise HcaError("Bad resolution range")
    else:
        if info.min_resolution > info.max_resolution or info.max_resolution > 15:
            raise HcaError("Bad resolution range")
    if info.track_count == 0:
        info.track_count = 1
    if info.track_count > info.channels:
        raise HcaError("Bad track count")
    if (info.total_band_count > 128 or info.base_band_count > 128
            or info.stereo_band_count > 128
            or info.base_band_count + info.stereo_band_count > 128
            or info.bands_per_hfr_group > 128):
        raise HcaError("Bad band counts")
    info.hfr_group_count = _ceil2(
        info.total_band_count - info.base_band_count - info.stereo_band_count,
        info.bands_per_hfr_group)
    if info.ms_stereo:
        raise HcaError("MS stereo streams unsupported")  # matches reference
    info.init_derived()
    return info


# ---------------------------------------------------------------------------
# Frame unpack (python reference path)
# ---------------------------------------------------------------------------

@dataclass
class UnpackedFrames:
    """SoA tensors for a run of frames, ready for the device transform."""
    qc: np.ndarray           # int16 [F, C, 8, 128] quantised spectrum values
    scalefactors: np.ndarray  # u8 [F, C, 128]
    resolutions: np.ndarray  # u8 [F, C, 128]
    intensity: np.ndarray    # u8 [F, C, 8]
    noise_src: np.ndarray    # int32 [F, C, 8, 128] source band (identity = self)
    noise_sci: np.ndarray    # u8 [F, C, 8, 128] scale conversion index
    noise_mask: np.ndarray   # bool [F, C, 8, 128]
    random_state: int        # LCG state after these frames


def _unpack_scalefactors(ch_type, coded_count, br, hfr_group_count, version):
    cs_count = int(coded_count)
    sf = np.zeros(128, dtype=np.uint8)
    extra = 0
    delta_bits = br.read(3)
    if not (ch_type == T.STEREO_SECONDARY or hfr_group_count <= 0
            or version <= VERSION_V200):
        extra = hfr_group_count
        cs_count += extra
        if cs_count > 128:
            raise HcaError("Unpack error (scalefactor count)")
    if delta_bits >= 6:
        for i in range(cs_count):
            sf[i] = br.read(6)
    elif delta_bits > 0:
        expected = (1 << delta_bits) - 1
        value = br.read(6)
        sf[0] = value
        for i in range(1, cs_count):
            delta = br.read(delta_bits)
            if delta == expected:
                value = br.read(6)
            else:
                test = value + (delta - (expected >> 1))
                if test < 0 or test >= 64:
                    raise HcaError("Unpack error (scalefactor delta)")
                value = (value - (expected >> 1) + delta) & 0x3F
            sf[i] = value
    # derived HFR scales for v3.0 (hca.cpp:1352-1355)
    for i in range(extra):
        sf[127 - i] = sf[cs_count - i]
    return sf


def _unpack_intensity(ch_type, br, hfr_group_count, version, sf):
    intensity = np.zeros(8, dtype=np.uint8)
    if ch_type == T.STEREO_SECONDARY:
        if version <= VERSION_V200:
            value = br.peek(4)
            intensity[0] = value
            if value < 15:
                br.skip(4)
                for i in range(1, 8):
                    intensity[i] = br.read(4)
        else:
            value = br.peek(4)
            if value < 15:
                br.skip(4)
                delta_bits = br.read(2)
                intensity[0] = value
                if delta_bits == 3:
                    for i in range(1, 8):
                        intensity[i] = br.read(4)
                else:
                    bmax = (2 << delta_bits) - 1
                    bits = delta_bits + 1
                    for i in range(1, 8):
                        delta = br.read(bits)
                        if delta == bmax:
                            value = br.read(4)
                        else:
                            value = value - (bmax >> 1) + delta
                            # the reference's `value` is unsigned char
                            # (hca.cpp:1383): a negative differential wraps
                            # to >= 241 and then fails its `> 15` check, so
                            # negative IS an error there — match it (the
                            # native path cricore.cpp:452 already does)
                            if value > 15 or value < 0:
                                raise HcaError("Unpack error (intensity)")
                        intensity[i] = value
            else:
                br.skip(4)
                intensity[:] = 7
    else:
        if version <= VERSION_V200:
            for i in range(hfr_group_count):
                sf[128 - hfr_group_count + i] = br.read(6)
    return intensity


def calc_resolutions(info: HcaInfo, sf: np.ndarray, coded_count: int,
                     packed_noise_level: int):
    """Vectorised calculate_resolution (hca.cpp:1444-1494).

    Returns (resolutions u8 [128], noises list-layout u8 [128], noise_count,
    valid_count).
    """
    res = np.zeros(128, dtype=np.uint8)
    noises = np.zeros(128, dtype=np.uint8)
    cc = int(coded_count)
    i = np.arange(cc)
    sf_c = sf[:cc].astype(np.int64)
    noise_level = info.ath[:cc].astype(np.int64) + ((packed_noise_level + i) >> 8)
    curve_pos = noise_level + 1 - ((5 * sf_c) >> 1)
    r = np.zeros(cc, dtype=np.int64)
    r = np.where(curve_pos < 0, 15, r)
    mid = (curve_pos >= 0) & (curve_pos <= 65)
    r[mid] = T.INVERT_TABLE[curve_pos[mid]]
    r = np.minimum(np.maximum(r, info.min_resolution), info.max_resolution)
    r = np.where(sf_c > 0, r, 0)
    res[:cc] = r

    active = sf_c > 0
    is_noise = active & (r < 1)
    is_valid = active & (r >= 1)
    noise_idx = i[is_noise]
    valid_idx = i[is_valid]
    noise_count = len(noise_idx)
    valid_count = len(valid_idx)
    noises[:noise_count] = noise_idx
    if valid_count:
        noises[128 - valid_count:] = valid_idx[::-1]
    return res, noises, noise_count, valid_count


def _dequantize_codes(br: BitReader, res: np.ndarray, coded_count: int) -> np.ndarray:
    """Read one subframe's quantised values for one channel. [128] int16."""
    qc = np.zeros(128, dtype=np.int16)
    for i in range(int(coded_count)):
        resolution = res[i]
        bits = T.MAX_BIT_TABLE[resolution]
        code = br.read(int(bits))
        if resolution > 7:
            value = (1 - ((code & 1) << 1)) * (code >> 1)
            if value == 0:
                br.skip(-1)
            qc[i] = value
        else:
            index = (int(resolution) << 4) + code
            br.skip(int(T.READ_BIT_TABLE[index]) - int(bits))
            qc[i] = T.READ_VAL_TABLE[index]
    return qc


def unpack_frames(info: HcaInfo, data: bytes, frame_indices=None,
                  random_state: int = 1, use_native: bool = True,
                  nthreads: int = 0, out=None) -> UnpackedFrames:
    """Unpack a run of frames from `data` (frame_size-strided) to SoA arrays.

    Dispatches to the C++ core (native/cricore.cpp, threaded across frames)
    when available and `frame_indices` is None; the Python path below is the
    behavioural reference. `out` may be an UnpackedFrames of preallocated
    destination views (batch pipeline writes straight into stacked tensors).
    """
    if use_native and frame_indices is None:
        res = _unpack_frames_native(info, data, random_state, nthreads, out)
        if res is not None:
            return res
    result = _unpack_frames_py(info, data, frame_indices, random_state)
    if out is not None:
        F = result.qc.shape[0]
        out.qc[:F] = result.qc
        out.scalefactors[:F] = result.scalefactors
        out.resolutions[:F] = result.resolutions
        out.intensity[:F] = result.intensity
        if result.noise_mask.any():
            out.noise_src[:F] = result.noise_src
            out.noise_sci[:F] = result.noise_sci
            out.noise_mask[:F] = result.noise_mask
        return result
    return result


def _unpack_frames_native(info: HcaInfo, data: bytes, random_state: int,
                          nthreads: int, out=None):
    import ctypes
    import os

    from .. import native

    lib = native.load()
    if lib is None:
        return None
    fs = info.frame_size
    nframes = len(data) // fs
    C = info.channels
    need_noise = info.min_resolution == 0
    if out is not None:
        def view(a):
            v = a[:nframes]
            assert v.flags["C_CONTIGUOUS"]
            return v
        qc = view(out.qc)
        sfs = view(out.scalefactors)
        ress = view(out.resolutions)
        intens = view(out.intensity)
        ident = view(out.noise_src)
        noise_sci = view(out.noise_sci)
        noise_mask8 = view(out.noise_mask).view(np.uint8)
    else:
        qc = np.zeros((nframes, C, 8, 128), dtype=np.int16)
        sfs = np.zeros((nframes, C, 128), dtype=np.uint8)
        ress = np.zeros((nframes, C, 128), dtype=np.uint8)
        intens = np.zeros((nframes, C, 8), dtype=np.uint8)
        if need_noise:
            ident = np.broadcast_to(np.arange(128, dtype=np.int32),
                                    (nframes, C, 8, 128)).copy()
            noise_sci = np.zeros((nframes, C, 8, 128), dtype=np.uint8)
        else:
            ident = np.zeros((1,) * 4, dtype=np.int32)
            noise_sci = np.zeros((1,) * 4, dtype=np.uint8)
        noise_mask8 = np.zeros(ident.shape, dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8, count=nframes * fs)
    rand = np.array([random_state], dtype=np.uint32)
    noise_mask = noise_mask8
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)

    def p(arr, ct):
        return arr.ctypes.data_as(ctypes.POINTER(ct))

    u8, i8, i16, i32, u16, u32 = (ctypes.c_uint8, ctypes.c_int8, ctypes.c_int16,
                                  ctypes.c_int32, ctypes.c_uint16, ctypes.c_uint32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    ctype = np.ascontiguousarray(info.channel_type, dtype=np.uint8)
    res = lib.cri_hca_unpack_frames(
        p(buf, u8), int(nframes), int(fs),
        p(np.ascontiguousarray(info.cipher), u8), int(C),
        int(info.version), int(info.hfr_group_count),
        int(info.min_resolution), int(info.max_resolution),
        p(ctype, u8), p(coded, i32), p(np.ascontiguousarray(info.ath), u8),
        p(_INVERT_U8, u8),
        p(_MAX_BIT_U8, u8),
        p(_READ_BIT_U8, u8),
        p(_READ_VAL_I8, i8),
        p(rand, u32),
        p(qc, i16), p(sfs, u8), p(ress, u8), p(intens, u8),
        p(ident, i32), p(noise_sci, u8), p(noise_mask, u8),
        int(nthreads))
    if res == -4:
        raise HcaError("Frame sync lost")
    if res == -3:
        raise HcaError("Frame checksum mismatch")
    if res < 0:
        raise HcaError("Unpack error")
    return UnpackedFrames(qc=qc, scalefactors=sfs, resolutions=ress,
                          intensity=intens, noise_src=ident,
                          noise_sci=noise_sci,
                          noise_mask=noise_mask.view(bool),
                          random_state=int(rand[0]))


def noise_lists(sf: np.ndarray, res: np.ndarray, coded_count: int):
    """Rebuild the reconstruct_noise band lists from (sf, res) alone.

    Identical to the lists calc_resolutions produces: noise bands (sf > 0,
    res < 1) in order at the head, valid bands reversed at the tail
    (hca.cpp:1468-1479). Lets the batched key scorer recover noise info
    from the native unpack's SoA outputs."""
    cc = int(coded_count)
    i = np.arange(cc)
    active = sf[:cc].astype(np.int64) > 0
    noise_idx = i[active & (res[:cc] < 1)]
    valid_idx = i[active & (res[:cc] >= 1)]
    noises = np.zeros(128, dtype=np.uint8)
    noises[:len(noise_idx)] = noise_idx
    if len(valid_idx):
        noises[128 - len(valid_idx):] = valid_idx[::-1]
    return noises, len(noise_idx), len(valid_idx)


def fill_noise_frame(info: HcaInfo, sfs_f: np.ndarray, frame_noise,
                     random: int, ident_f: np.ndarray, sci_f: np.ndarray,
                     mask_f: np.ndarray) -> int:
    """One frame's PNS noise gather maps (reconstruct_noise order,
    hca.cpp:1602-1635): subframe-major, channel-minor, one LCG draw per
    noise band. sfs_f [C, 128]; frame_noise: per-channel (noises, nc, vc);
    writes into [C, 8, 128] views; returns the advanced LCG state."""
    C = len(frame_noise)
    for s in range(8):
        for c in range(C):
            noises, nc, vc = frame_noise[c]
            if vc <= 0 or nc <= 0:
                continue
            if info.ms_stereo and info.channel_type[c] != T.STEREO_PRIMARY:
                continue
            for i in range(nc):
                random = (0x343FD * random + 0x269EC3) & 0xFFFFFFFF
                rindex = 128 - vc + (((random & 0x7FFF) * vc) >> 15)
                nb = int(noises[i])
                vb = int(noises[rindex])
                sci = int(sfs_f[c, nb]) - int(sfs_f[c, vb]) + 62
                if sci < 0:
                    sci = 0
                ident_f[c, s, nb] = vb
                sci_f[c, s, nb] = sci
                mask_f[c, s, nb] = True
    return random


def _unpack_frames_py(info: HcaInfo, data: bytes, frame_indices=None,
                      random_state: int = 1) -> UnpackedFrames:
    """Pure-Python unpack (reference path)."""
    fs = info.frame_size
    nframes = len(data) // fs if frame_indices is None else len(frame_indices)
    C = info.channels
    qc = np.zeros((nframes, C, 8, 128), dtype=np.int16)
    sfs = np.zeros((nframes, C, 128), dtype=np.uint8)
    ress = np.zeros((nframes, C, 128), dtype=np.uint8)
    intens = np.zeros((nframes, C, 8), dtype=np.uint8)
    ident = np.broadcast_to(np.arange(128, dtype=np.int32), (nframes, C, 8, 128)).copy()
    noise_sci = np.zeros((nframes, C, 8, 128), dtype=np.uint8)
    noise_mask = np.zeros((nframes, C, 8, 128), dtype=bool)

    need_noise = info.min_resolution == 0
    random = random_state
    cipher = info.cipher

    for f in range(nframes):
        idx = f if frame_indices is None else frame_indices[f]
        frame = np.frombuffer(data, dtype=np.uint8, count=fs, offset=idx * fs)
        if not (frame[0] == 0xFF and frame[1] == 0xFF):
            raise HcaError("Frame sync lost")
        if crc16(frame.tobytes()):
            raise HcaError("Frame checksum mismatch")
        dec = cipher[frame]
        br = BitReader(dec.tobytes())
        br.skip(16)
        anl = br.read(9)
        evb = br.read(7)
        packed_noise_level = (anl << 8) - evb

        frame_noise = []  # (ch, noises, noise_count, valid_count)
        for c in range(C):
            ct = info.channel_type[c]
            sf = _unpack_scalefactors(ct, info.coded_count[c], br,
                                      info.hfr_group_count, info.version)
            intens[f, c] = _unpack_intensity(ct, br, info.hfr_group_count,
                                             info.version, sf)
            res, noises, nc, vc = calc_resolutions(
                info, sf, info.coded_count[c], packed_noise_level)
            sfs[f, c] = sf
            ress[f, c] = res
            frame_noise.append((noises, nc, vc))

        for s in range(8):
            for c in range(C):
                qc[f, c, s] = _dequantize_codes(br, ress[f, c], info.coded_count[c])

        if need_noise:
            random = fill_noise_frame(info, sfs[f], frame_noise, random,
                                      ident[f], noise_sci[f], noise_mask[f])

    return UnpackedFrames(qc=qc, scalefactors=sfs, resolutions=ress,
                          intensity=intens, noise_src=ident, noise_sci=noise_sci,
                          noise_mask=noise_mask, random_state=random)


# ---------------------------------------------------------------------------
# Frame pack (encode back-end)
# ---------------------------------------------------------------------------

def pack_frame(info: HcaInfo, acceptable_noise_level: int, evaluation_boundary: int,
               scalefactors: np.ndarray, resolutions: np.ndarray,
               intensity: np.ndarray, hfr_scales: np.ndarray,
               delta_bits: np.ndarray, quantized: np.ndarray) -> bytes:
    """Serialise one frame (PackFrame, hca.cpp:2938-2963).

    scalefactors u8 [C,128], resolutions u8 [C,128], intensity u8 [C,8],
    hfr_scales int [C, groups], delta_bits int [C], quantized int [C,8,128].
    """
    fs = info.frame_size
    bw = BitWriter(fs - 2)
    bw.write(acceptable_noise_level, 9)
    bw.write(evaluation_boundary, 7)
    for c in range(info.channels):
        cc = int(info.coded_count[c])
        db = int(delta_bits[c])
        scales = scalefactors[c]
        bw.write(db, 3)
        if db != 0:
            if db == 6:
                for i in range(cc):
                    bw.write(int(scales[i]), 6)
            else:
                bw.write(int(scales[0]), 6)
                max_delta = (1 << (db - 1)) - 1
                escape = (1 << db) - 1
                for i in range(1, cc):
                    delta = int(scales[i]) - int(scales[i - 1])
                    if abs(delta) > max_delta:
                        bw.write(escape, db)
                        bw.write(int(scales[i]), 6)
                    else:
                        bw.write(max_delta + delta, db)
        if info.channel_type[c] == T.STEREO_SECONDARY:
            for i in range(8):
                bw.write(int(intensity[c, i]), 4)
        elif info.hfr_group_count > 0:
            for g in range(info.hfr_group_count):
                bw.write(int(hfr_scales[c, g]), 6)
    for s in range(8):
        for c in range(info.channels):
            cc = int(info.coded_count[c])
            for i in range(cc):
                resolution = int(resolutions[c, i])
                q = int(quantized[c, s, i])
                if resolution == 0:
                    continue
                if resolution < 8:
                    bits = int(T.QUANTIZE_SPECTRUM_BITS[resolution, q + 8])
                    bw.write(int(T.QUANTIZE_SPECTRUM_VALUE[resolution, q + 8]), bits)
                elif resolution < 16:
                    bits = int(T.QUANTIZED_SPECTRUM_MAX_BITS[resolution]) - 1
                    bw.write(abs(q), bits)
                    if q != 0:
                        bw.write(0 if q > 0 else 1, 1)
    bw.align(8)
    body = bw.getvalue()
    frame = bytearray(fs)
    frame[0:2] = b"\xFF\xFF"
    frame[2:fs - 2 + 2] = body
    crc = crc16(bytes(frame[:fs - 2]))
    frame[fs - 2:] = crc.to_bytes(2, "big")
    return bytes(frame)


# ---------------------------------------------------------------------------
# Key testing (clHCA_TestBlock analogue, hca.cpp:1004-1097)
# ---------------------------------------------------------------------------

def test_block(info: HcaInfo, frame: bytes, random_state: int = 1) -> int:
    """Statistically score one frame under the current cipher table
    (clHCA_TestBlock, hca.cpp:1004-1097).

    Returns the reference's scoring: 0 = silent/neutral, 1 = plausible,
    2/3/clips = suspicious, negative = hard bitstream failure. The LCG
    noise state threads across calls in the reference; use
    test_block_state to carry it (score_key does).
    """
    return test_block_state(info, frame, random_state)[0]


def test_block_state(info: HcaInfo, frame: bytes,
                     random_state: int = 1) -> tuple:
    """test_block + the advanced noise LCG state: (score, random_state)."""
    fs = info.frame_size
    frame = bytes(frame[:fs])
    random = random_state
    if all(b == 0 for b in frame[2:fs - 2]):
        return 0, random
    # unpack with bit-position tracking
    if not (frame[0] == 0xFF and frame[1] == 0xFF):
        return -1, random
    if crc16(frame):
        return -1, random
    dec = info.cipher[np.frombuffer(frame, dtype=np.uint8)]
    br = BitReader(dec.tobytes())
    br.skip(16)
    anl = br.read(9)
    evb = br.read(7)
    packed_noise_level = (anl << 8) - evb
    C = info.channels
    sfs = np.zeros((C, 128), dtype=np.uint8)
    ress = np.zeros((C, 128), dtype=np.uint8)
    intens = np.zeros((C, 8), dtype=np.uint8)
    frame_noise = []
    try:
        for c in range(C):
            ct = info.channel_type[c]
            sf = _unpack_scalefactors(ct, info.coded_count[c], br,
                                      info.hfr_group_count, info.version)
            intens[c] = _unpack_intensity(ct, br, info.hfr_group_count,
                                          info.version, sf)
            res, noises, nc, vc = calc_resolutions(
                info, sf, info.coded_count[c], packed_noise_level)
            sfs[c] = sf
            ress[c] = res
            frame_noise.append((noises, nc, vc))
        qc = np.zeros((C, 8, 128), dtype=np.int16)
        for s in range(8):
            for c in range(C):
                qc[c, s] = _dequantize_codes(br, ress[c], info.coded_count[c])
    except HcaError:
        return -1, random
    status = br.pos
    bits_max = fs * 8
    if status + 14 > bits_max:
        return -6, random
    byte_start = (status // 8) + (1 if status % 8 else 0)
    if any(dec[i] != 0 for i in range(byte_start, fs - 2)):
        return -1, random

    # transform and inspect the waveform (float domain)
    from . import hca_kernels
    hfr = hca_kernels.build_hfr_map(
        info.total_band_count, info.base_band_count, info.stereo_band_count,
        info.bands_per_hfr_group, info.hfr_group_count, info.version)
    pairs = hca_kernels.stereo_pairs_of(info.channel_type) \
        if info.stereo_band_count > 0 else ()
    noise_kw = {}
    if info.min_resolution == 0:
        # the reference's TestBlock runs the FULL transform incl. PNS noise
        # (v3.0 streams), with the LCG state threading across frames
        ident = np.broadcast_to(np.arange(128, dtype=np.int32),
                                (C, 8, 128)).copy()
        sci = np.zeros((C, 8, 128), dtype=np.uint8)
        mask = np.zeros((C, 8, 128), dtype=bool)
        random = fill_noise_frame(info, sfs, frame_noise, random,
                                  ident, sci, mask)
        noise_kw = dict(noise_src=ident[None, None],
                        noise_sci=sci[None, None],
                        noise_mask=mask[None, None])
    wave = hca_kernels.hca_decode_wave(
        qc[None, None], sfs[None, None], ress[None, None], intens[None, None],
        np.asarray(hfr.band_is_hfr), np.asarray(hfr.src_band),
        np.asarray(hfr.group_of), np.int32(hfr.zero_band),
        base_band=int(info.base_band_count),
        total_band=int(info.total_band_count), stereo_pairs=pairs,
        apply_hfr=bool(info.bands_per_hfr_group > 0 and info.hfr_group_count > 0),
        hfr_group_count=int(info.hfr_group_count), **noise_kw)
    wave = np.asarray(wave)[0]  # [C, 8, 128] time layout

    clips = int((np.abs(wave) > 1.0).sum())
    scaled = np.trunc(wave.astype(np.float64) * 32768.0).astype(np.int64)
    blank = (np.abs(wave) <= 1.0) & ((scaled == 0) | (scaled == -1))
    blanks = int(blank.sum())
    channel_blanks = blank.reshape(C, -1).sum(axis=1)
    frame_samples = 8 * 128
    if clips == 1:
        clips += 1
    if clips > 1:
        return clips, random
    if blanks == C * frame_samples:
        return 0, random
    if C >= 2 and channel_blanks[0] == frame_samples \
            and channel_blanks[1] != frame_samples:
        return 3, random
    return 1, random


def score_key(data: bytes, keycode: int, subkey: int = 0,
              max_frames: int = 16) -> int:
    """Aggregate test_block score over the first frames of an HCA stream.

    Per-frame scores follow clHCA_TestBlock: 1 = clean decode, 0 = silent,
    >1 = clipped/suspect, negative = bitstream failure.  So among accepted
    keys the LOWEST positive total is the most plausible (1 per frame is
    ideal; clips inflate the total); 0 = all-silent/inconclusive; -1 = the
    key is rejected.  Rank with parallel.rank_keys.
    """
    header_size = int.from_bytes(data[6:8], "big")
    info = parse_header(data[:header_size])
    info.set_key(hca_crypt.scramble_subkey(keycode, subkey))
    total = 0
    tested = 0
    random = 1
    for f in range(min(max_frames, info.frame_count)):
        off = header_size + f * info.frame_size
        frame = data[off:off + info.frame_size]
        if len(frame) < info.frame_size:
            break
        score, random = test_block_state(info, frame, random)
        if score < 0:
            return -1
        total += score
        tested += 1
    return total if tested else -1


def test_frames_native(info: HcaInfo, frames: bytes, cipher_tables,
                       want_soa: bool = True):
    """Batched clHCA_TestBlock front half over (key, frame) pairs.

    frames: nframes * frame_size raw bytes; cipher_tables: uint8 [K, 256].
    Returns (status i32 [K, F], qc, sfs, ress, intens) with the SoA tensors
    shaped [K*F, C, ...] (only rows with status == 1 are meaningful), or
    None when the native core is unavailable. Semantics mirror test_block
    (reference hca.cpp:1004-1097) minus the float wave inspection, which
    the caller batches on the device.
    """
    import ctypes
    import os

    from .. import native
    lib = native.load()
    if lib is None:
        return None
    fs = info.frame_size
    F = len(frames) // fs
    K = cipher_tables.shape[0]
    C = info.channels
    status = np.zeros((K, F), dtype=np.int32)
    if want_soa:
        qc = np.zeros((K * F, C, 8, 128), dtype=np.int16)
        sfs = np.zeros((K * F, C, 128), dtype=np.uint8)
        ress = np.zeros((K * F, C, 128), dtype=np.uint8)
        intens = np.zeros((K * F, C, 8), dtype=np.uint8)
    else:
        qc = sfs = ress = intens = None
    buf = np.frombuffer(frames, dtype=np.uint8, count=F * fs)
    ciphers = np.ascontiguousarray(cipher_tables, dtype=np.uint8)
    # key-independent per-frame prechecks, hoisted out of the (key, frame)
    # loop: silent (score 0), bad sync/CRC (-1)
    fb = buf.reshape(F, fs)
    silent = ~(fb[:, 2:fs - 2].any(axis=1))
    bad = (fb[:, 0] != 0xFF) | (fb[:, 1] != 0xFF) | (crc.crc16_batch(fb) != 0)
    frame_pre = np.where(silent, 1, np.where(bad, -1, 0)).astype(np.int32)

    def p(arr, ct):
        if arr is None:
            return None
        return arr.ctypes.data_as(ctypes.POINTER(ct))

    u8, i8, i16, i32 = (ctypes.c_uint8, ctypes.c_int8, ctypes.c_int16,
                        ctypes.c_int32)
    coded = np.ascontiguousarray(info.coded_count, dtype=np.int32)
    ctype = np.ascontiguousarray(info.channel_type, dtype=np.uint8)
    lib.cri_hca_test_frames(
        p(buf, u8), p(frame_pre, i32), int(F), int(fs), p(ciphers, u8),
        int(K),
        int(C), int(info.version), int(info.hfr_group_count),
        int(info.min_resolution), int(info.max_resolution),
        p(ctype, u8), p(coded, i32), p(np.ascontiguousarray(info.ath), u8),
        p(_INVERT_U8, u8),
        p(_MAX_BIT_U8, u8),
        p(_READ_BIT_U8, u8),
        p(_READ_VAL_I8, i8),
        p(status, i32), p(qc, i16), p(sfs, u8), p(ress, u8), p(intens, u8),
        int(min(os.cpu_count() or 1, 16)))
    return status, qc, sfs, ress, intens


def pack_frames_native(info: HcaInfo, anl, evb, scalefactors, resolutions,
                       intensity, hfr_scales, delta_bits, quantized,
                       nthreads: int = 0):
    """Batch frame packing via the C++ core. Returns bytes or None.

    Array layouts match what ops/hca_encode_host produces for all frames at
    once; per-frame behaviour is identical to pack_frame().
    """
    import ctypes
    import os

    from .. import native

    lib = native.load()
    if lib is None:
        return None
    F = len(anl)
    C = info.channels
    G = max(int(info.hfr_group_count), 1)
    out = np.zeros((F, info.frame_size), dtype=np.uint8)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)

    def p(arr, ct):
        return np.ascontiguousarray(arr).ctypes.data_as(ctypes.POINTER(ct))

    u8, i32 = ctypes.c_uint8, ctypes.c_int32
    lib.cri_hca_pack_frames(
        int(F), int(info.frame_size), int(C), int(info.hfr_group_count),
        p(info.channel_type.astype(np.uint8), u8),
        p(info.coded_count.astype(np.int32), i32),
        p(np.asarray(anl, dtype=np.int32), i32),
        p(np.asarray(evb, dtype=np.int32), i32),
        p(np.asarray(scalefactors, dtype=np.uint8), u8),
        p(np.asarray(resolutions, dtype=np.uint8), u8),
        p(np.asarray(intensity, dtype=np.uint8), u8),
        p(np.asarray(hfr_scales, dtype=np.int32).reshape(F, C, G), i32),
        p(np.asarray(delta_bits, dtype=np.int32), i32),
        p(np.asarray(quantized, dtype=np.int32), i32),
        p(np.ascontiguousarray(T.QUANTIZE_SPECTRUM_BITS, dtype=np.uint8), u8),
        p(np.ascontiguousarray(T.QUANTIZE_SPECTRUM_VALUE, dtype=np.uint8), u8),
        p(np.ascontiguousarray(T.QUANTIZED_SPECTRUM_MAX_BITS, dtype=np.uint8), u8),
        out.ctypes.data_as(ctypes.POINTER(u8)),
        int(nthreads))
    return out.tobytes()
