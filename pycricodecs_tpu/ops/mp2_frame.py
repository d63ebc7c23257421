"""MPEG Audio Layer II host bitstream layer (for the AHX codec).

The serial half of MP2 decode/encode: frame header parse, bit-allocation /
scalefactor / sample unpack into dense SoA tensors for the device kernels
(ops/mp2_kernels.py), and the inverse frame packer for the encoder.

Supports MPEG-1 (tables 3-B.2a-d) and MPEG-2 LSF (13818-3 Table B.1) Layer II,
mono / stereo / dual / joint (intensity) stereo.  AHX streams are MPEG-2 LSF
mono, but the general decoder doubles as a standalone .mp2 front-end.

This is new capability, absent from the reference package (it only carries
@AHX USM chunks around, PyCriCodecs/usm.py:171 / chunk.py:22).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from . import mp2_tables as T
from ..utils.bitio import BitWriter

SAMPLES_PER_FRAME = 1152          # 12 granules x 3 samples x 32 subbands
GRANULES = 12


class Mp2Header(NamedTuple):
    version: int          # 3 = MPEG-1, 2 = MPEG-2 LSF (header field value)
    layer: int            # always 2 here
    crc: bool             # protection bit 0 -> 16-bit CRC present
    bitrate: int          # bits/s
    sample_rate: int
    padding: int
    mode: int             # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext: int
    nch: int
    frame_size: int       # bytes, including header (+pad)
    table_id: int         # allocation table 0-4
    sblimit: int
    bound: int            # first subband coded jointly (== sblimit if none)


class Mp2Stream(NamedTuple):
    """SoA unpack of a whole Layer II stream (one config for all frames)."""
    header: Mp2Header
    codes: np.ndarray     # uint16 [F, C, 36, 32]
    levels: np.ndarray    # int32  [F, C, 32]  quant levels, 0 = silent
    sfidx: np.ndarray     # uint8  [F, C, 3, 32]  scalefactor index per part
    nframes: int


def parse_header(data: bytes, offset: int = 0) -> Mp2Header:
    """Parse one 32-bit Layer II frame header at ``offset``."""
    w = int.from_bytes(data[offset:offset + 4], "big")
    if (w >> 21) & 0x7FF != 0x7FF:
        raise ValueError("MPEG sync word not found.")
    version = (w >> 19) & 3
    layer_code = (w >> 17) & 3
    if layer_code != 2:                       # 10b = Layer II
        raise ValueError("Not an MPEG Layer II frame.")
    if version not in (2, 3):                 # 10b = MPEG-2 LSF, 11b = MPEG-1
        raise ValueError("Unsupported MPEG version (2.5).")
    crc = not ((w >> 16) & 1)
    bri = (w >> 12) & 0xF
    sri = (w >> 10) & 3
    if bri in (0, 15) or sri == 3:
        raise ValueError("Free-format/invalid Layer II header.")
    padding = (w >> 9) & 1
    mode = (w >> 6) & 3
    mode_ext = (w >> 4) & 3
    nch = 1 if mode == 3 else 2
    if version == 3:
        bitrate = T.BITRATES_V1_L2[bri] * 1000
        sample_rate = T.SAMPLE_RATES_V1[sri]
        table_id = T.TABLE_SELECT[sri][0 if nch == 2 else 1][bri]
    else:
        bitrate = T.BITRATES_V2_L2[bri] * 1000
        sample_rate = T.SAMPLE_RATES_V2[sri]
        table_id = 4
    sblimit = len(T.ALLOC_TABLES[table_id])
    bound = (mode_ext + 1) * 4 if mode == 1 else sblimit
    bound = min(bound, sblimit)
    frame_size = 144 * bitrate // sample_rate + padding
    return Mp2Header(version, 2, crc, bitrate, sample_rate, padding, mode,
                     mode_ext, nch, frame_size, table_id, sblimit, bound)


class _Bits:
    """MSB-first reader over one frame via a single big int (fast enough for
    the ~5000-bit Layer II frames; banks go through the batched path)."""

    __slots__ = ("v", "n", "p")

    def __init__(self, buf: bytes) -> None:
        self.v = int.from_bytes(buf, "big")
        self.n = len(buf) * 8
        self.p = 0

    def get(self, count: int) -> int:
        p = self.p + count
        if p > self.n:
            raise ValueError("Layer II frame truncated mid-field.")
        self.p = p
        return (self.v >> (self.n - p)) & ((1 << count) - 1)


def _read_side_info(frame: bytes, hdr: Mp2Header,
                    levels: np.ndarray, sfidx: np.ndarray
                    ) -> Tuple[np.ndarray, int]:
    """Serial part of one frame: alloc/scfsi/scalefactors (data-dependent
    layout).  Fills levels [C, 32] / sfidx [C, 3, 32]; returns (alloc levels
    [C, sblimit], bit position where the sample section starts)."""
    bs = _Bits(frame)
    bs.get(32)
    if hdr.crc:
        bs.get(16)
    table = T.ALLOC_TABLES[hdr.table_id]
    sblimit, bound, nch = hdr.sblimit, hdr.bound, hdr.nch

    alloc = np.zeros((nch, sblimit), dtype=np.int32)
    for sb in range(sblimit):
        classes = table[sb]
        nbal = (len(classes) - 1).bit_length()
        if sb < bound:
            for ch in range(nch):
                alloc[ch, sb] = classes[bs.get(nbal)]
        else:
            alloc[:, sb] = classes[bs.get(nbal)]

    scfsi = np.zeros((nch, sblimit), dtype=np.int32)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                scfsi[ch, sb] = bs.get(2)

    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch, sb]:
                continue
            s = scfsi[ch, sb]
            if s == 0:
                a, b, c = bs.get(6), bs.get(6), bs.get(6)
            elif s == 1:
                a = b = bs.get(6)
                c = bs.get(6)
            elif s == 2:
                a = b = c = bs.get(6)
            else:
                a = bs.get(6)
                b = c = bs.get(6)
            sfidx[ch, :, sb] = a, b, c

    levels[:, :sblimit] = alloc
    return alloc, bs.p


def _frame_field_layout(alloc: np.ndarray, hdr: Mp2Header) -> np.ndarray:
    """Sample-field descriptors for ONE granule of one frame's allocation.

    Returns int64 [nfields, 5]: (width, ch, sb, levels, sample).  ch == -1
    marks a field shared by both channels (joint stereo above the bound).
    Grouped allocations are one field carrying samples 0-2 (sample == -1);
    ungrouped ones are three consecutive fields with sample 0/1/2.  All 12
    granules repeat this layout back to back.
    """
    rows = []
    for sb in range(hdr.sblimit):
        shared = sb >= hdr.bound
        for ch in range(1 if shared else hdr.nch):
            n = int(alloc[ch, sb])
            if not n:
                continue
            dest = -1 if shared else ch
            gb = T.GROUP_BITS.get(n)
            if gb is not None:
                rows.append((gb, dest, sb, n, -1))
            else:
                nb = T.code_bits(n)
                rows.extend((nb, dest, sb, n, k) for k in range(3))
    return np.array(rows, dtype=np.int64).reshape(-1, 5)


def scan_frames(data: bytes, offset: int = 0,
                max_frames: Optional[int] = None
                ) -> Tuple[Mp2Header, List[Tuple[int, bytes]]]:
    """Walk consecutive same-config Layer II frames; returns (first header,
    [(abs byte offset, frame bytes)]). Shared by unpack() and the device
    unpacker's raw-frame stacking."""
    hdr0 = parse_header(data, offset)
    frames = []                                  # (abs byte offset, frame)
    pos = offset
    while pos + 4 <= len(data):
        try:
            hdr = parse_header(data, pos)
        except ValueError:
            break
        if (hdr.version, hdr.sample_rate, hdr.mode, hdr.table_id) != \
                (hdr0.version, hdr0.sample_rate, hdr0.mode, hdr0.table_id):
            break
        if pos + hdr.frame_size > len(data):
            break
        frames.append((pos, data[pos:pos + hdr.frame_size]))
        pos += hdr.frame_size
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("No complete Layer II frame found.")
    return hdr0, frames


def unpack(data: bytes, offset: int = 0,
           max_frames: Optional[int] = None,
           use_native: bool = True) -> Mp2Stream:
    """Unpack consecutive Layer II frames starting at ``offset`` into SoA
    tensors.  Stops at end of data, a sync loss, or a config change.

    Fast path: the C++ core (native/cricore.cpp cri_mp2_unpack_frames)
    unpacks whole streams in one call.  Python fallback: the data-dependent
    side info (alloc/scfsi/scalefactors) is read serially per frame; the
    sample sections — fixed-layout once alloc is known — are extracted for
    ALL frames at once with width-bucketed vectorised bit gathers, then
    ungrouped and scattered into [F, C, 36, 32]."""
    hdr0, frames = scan_frames(data, offset, max_frames)

    F, C = len(frames), hdr0.nch
    codes = np.zeros((F, C, 36, 32), dtype=np.uint16)
    levels = np.zeros((F, C, 32), dtype=np.int32)
    sfidx = np.zeros((F, C, 3, 32), dtype=np.uint8)

    if use_native and _unpack_native(data, frames, hdr0,
                                     codes, levels, sfidx):
        return Mp2Stream(hdr0, codes, levels, sfidx, F)

    # serial pass: side info + per-frame field layouts
    per_frame = []                               # (desc [n,5], offs, rows, i)
    for i, (byte_off, frame) in enumerate(frames):
        hdr = parse_header(frame)
        alloc, sample_bit = _read_side_info(frame, hdr, levels[i], sfidx[i])
        desc = _frame_field_layout(alloc, hdr)
        if not desc.size:
            continue
        tiled = np.tile(desc, (GRANULES, 1))     # 12 granules, same layout
        w = tiled[:, 0]
        if sample_bit + int(w.sum()) > hdr.frame_size * 8:
            raise ValueError("Layer II frame truncated mid-field.")
        offs = byte_off * 8 + sample_bit + np.cumsum(w) - w
        rows = np.repeat(np.arange(GRANULES, dtype=np.int64) * 3, len(desc))
        per_frame.append((tiled, offs, rows, i))

    if per_frame:
        desc = np.concatenate([p[0] for p in per_frame])
        off = np.concatenate([p[1] for p in per_frame])
        frow = np.concatenate([p[2] for p in per_frame])
        ffr = np.concatenate([np.full(len(p[0]), p[3], dtype=np.int64)
                              for p in per_frame])
        w, fch, fsb, flv, fsamp = desc.T

        # width-bucketed bit gather over the whole stream at once
        end = frames[-1][0] + len(frames[-1][1])
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8, count=end))
        vals = np.zeros(len(w), dtype=np.int64)
        for width in np.unique(w):
            sel = np.nonzero(w == width)[0]
            pw = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
            # chunk the gather: the [n, width] int64 index matrix would
            # otherwise cost ~64x the stream size in transient RAM
            step = max(1, (1 << 22) // int(width))
            for s0 in range(0, sel.size, step):
                part = sel[s0:s0 + step]
                idx = off[part, None] + np.arange(width)
                vals[part] = bits[idx] @ pw

        # expand grouped fields into their three samples, then scatter
        g = fsamp < 0
        u = ~g
        n = flv[g]
        c = vals[g]
        FR = np.concatenate([ffr[u], ffr[g], ffr[g], ffr[g]])
        CH = np.concatenate([fch[u], fch[g], fch[g], fch[g]])
        SB = np.concatenate([fsb[u], fsb[g], fsb[g], fsb[g]])
        ROW = np.concatenate([frow[u] + fsamp[u], frow[g], frow[g] + 1,
                              frow[g] + 2])
        V = np.concatenate([vals[u], c % n, (c // n) % n, c // (n * n)])
        shared = CH < 0
        for ch in range(C):
            sel = shared | (CH == ch)
            codes[FR[sel], ch, ROW[sel], SB[sel]] = V[sel]
    return Mp2Stream(hdr0, codes, levels, sfidx, F)


# --- encoder side ------------------------------------------------------------

def header_word(version: int, bitrate_idx: int, sr_idx: int, padding: int,
                mode: int, mode_ext: int = 0) -> int:
    return ((0x7FF << 21) | (version << 19) | (2 << 17) | (1 << 16)
            | (bitrate_idx << 12) | (sr_idx << 10) | (padding << 9)
            | (mode << 6) | (mode_ext << 4))


def pack_frame(hdr: Mp2Header, bitrate_idx: int, sr_idx: int,
               alloc_idx: np.ndarray, scfsi: np.ndarray,
               sfidx: np.ndarray, codes: np.ndarray) -> bytes:
    """Pack one Layer II frame (no CRC).  alloc_idx [C, sblimit] are table
    indices (not levels); scfsi [C, sblimit]; sfidx [C, 3, sblimit];
    codes [C, 36, sblimit] quantised sample codes."""
    table = T.ALLOC_TABLES[hdr.table_id]
    sblimit, bound, nch = hdr.sblimit, hdr.bound, hdr.nch
    bw = BitWriter(hdr.frame_size)
    bw.write(header_word(hdr.version, bitrate_idx, sr_idx, hdr.padding,
                         hdr.mode, hdr.mode_ext), 32)

    for sb in range(sblimit):
        nbal = (len(table[sb]) - 1).bit_length()
        for ch in range(nch if sb < bound else 1):
            bw.write(int(alloc_idx[ch, sb]), nbal)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc_idx[ch, sb]:
                bw.write(int(scfsi[ch, sb]), 2)
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc_idx[ch, sb]:
                continue
            s = int(scfsi[ch, sb])
            a, b, c = (int(v) for v in sfidx[ch, :, sb])
            if s == 0:
                bw.write(a, 6), bw.write(b, 6), bw.write(c, 6)
            elif s == 1:
                bw.write(a, 6), bw.write(c, 6)
            elif s == 2:
                bw.write(a, 6)
            else:
                bw.write(a, 6), bw.write(b, 6)

    for gr in range(GRANULES):
        row = gr * 3
        for sb in range(sblimit):
            for ch in range(nch if sb < bound else 1):
                n = table[sb][int(alloc_idx[ch, sb])]
                if not n:
                    continue
                v0 = int(codes[ch, row, sb])
                v1 = int(codes[ch, row + 1, sb])
                v2 = int(codes[ch, row + 2, sb])
                gb = T.GROUP_BITS.get(n)
                if gb is not None:
                    bw.write(v0 + n * (v1 + n * v2), gb)
                else:
                    nb = T.code_bits(n)
                    bw.write(v0, nb), bw.write(v1, nb), bw.write(v2, nb)
    return bw.getvalue()


def _bit_scatter(bits: np.ndarray, offs: np.ndarray, widths: np.ndarray,
                 vals: np.ndarray) -> None:
    """Write MSB-first fields into an unpacked bit array, bucketed by width
    (the unpack() gather in reverse).  Fields must not overlap."""
    offs = offs.astype(np.int64, copy=False)
    vals = vals.astype(np.int64, copy=False)
    for w in np.unique(widths):
        sel = np.nonzero(widths == w)[0]
        j = np.arange(w, dtype=np.int64)
        idx = offs[sel, None] + j
        bits[idx] = (vals[sel, None] >> (w - 1 - j)) & 1


def pack_frames(hdr: Mp2Header, bitrate_idx: int, sr_idx: int,
                alloc_idx: np.ndarray, scfsi: np.ndarray,
                sfidx: np.ndarray, codes: np.ndarray,
                pads: np.ndarray, frame_sizes: np.ndarray) -> bytes:
    """Pack a whole CBR Layer II stream at once (no CRC) — byte-identical
    to per-frame ``pack_frame`` (kept as the reference implementation), but
    every section lays its field offsets out with prefix sums and writes
    through width-bucketed vectorised bit scatters, so the cost is a few
    numpy passes instead of ~100 BitWriter calls per frame.

    alloc_idx [F, C, SB] (table indices), scfsi [F, C, SB],
    sfidx [F, C, 3, SB], codes [F, C, 36, SB], pads/frame_sizes [F].
    """
    table = T.ALLOC_TABLES[hdr.table_id]
    sblimit, bound, C = hdr.sblimit, hdr.bound, hdr.nch
    F = alloc_idx.shape[0]
    alloc_idx = alloc_idx.astype(np.int64, copy=False)
    fsz = np.asarray(frame_sizes, dtype=np.int64)
    fb0 = np.cumsum(fsz) * 8 - fsz * 8                   # frame start bits
    bits = np.zeros(int(fsz.sum()) * 8, dtype=np.uint8)

    # header (padding varies per frame)
    base_hdr = header_word(hdr.version, bitrate_idx, sr_idx, 0,
                           hdr.mode, hdr.mode_ext)
    _bit_scatter(bits, fb0, np.full(F, 32), base_hdr | (np.asarray(
        pads, np.int64) << 9))

    # alloc section: static (sb, ch) layout
    nbal = np.array([(len(table[sb]) - 1).bit_length()
                     for sb in range(sblimit)], dtype=np.int64)
    pairs = [(sb, ch) for sb in range(sblimit)
             for ch in range(C if sb < bound else 1)]
    aw = np.array([nbal[sb] for sb, _ in pairs], dtype=np.int64)
    aoff = 32 + np.cumsum(aw) - aw
    asb = np.array([sb for sb, _ in pairs])
    ach = np.array([ch for _, ch in pairs])
    _bit_scatter(bits, (fb0[:, None] + aoff[None, :]).ravel(),
                 np.broadcast_to(aw, (F, len(pairs))).ravel(),
                 alloc_idx[:, ach, asb].ravel())
    scfsi0 = 32 + int(aw.sum())

    # scfsi: 2 bits per active (sb, ch), full C loop (pack_frame reads the
    # whole alloc matrix here, shared subbands included)
    act = (alloc_idx > 0).transpose(0, 2, 1).reshape(F, sblimit * C)
    pre = np.cumsum(act, axis=1) - act
    soff = fb0[:, None] + scfsi0 + 2 * pre
    sel = act.ravel()
    _bit_scatter(bits, soff.ravel()[sel],
                 np.full(int(sel.sum()), 2),
                 scfsi.transpose(0, 2, 1).reshape(F, -1).ravel()[sel])
    sf0 = scfsi0 + 2 * act.sum(axis=1)                   # [F]

    # scalefactors: 1-3 six-bit fields per active (sb, ch) by scfsi
    s = scfsi.transpose(0, 2, 1).reshape(F, -1).astype(np.int64)
    nsf = np.where(act, np.choose(s, [3, 2, 1, 2]), 0)
    sfpre = np.cumsum(nsf, axis=1) - nsf
    sfoff = fb0[:, None] + sf0[:, None] + 6 * sfpre      # slot0 offset
    sfv = sfidx.transpose(0, 3, 1, 2).reshape(F, sblimit * C, 3)
    a_v, b_v, c_v = sfv[..., 0], sfv[..., 1], sfv[..., 2]
    m0 = act                                             # slot0: always a
    m1 = act & (nsf >= 2)            # slot1: b (s==0/3) or c (s==1)
    v1 = np.where(s == 1, c_v, b_v)
    m2 = act & (nsf == 3)                                # slot2: c (s==0)
    offs = np.concatenate([sfoff[m0], sfoff[m1] + 6, sfoff[m2] + 12])
    vals = np.concatenate([a_v[m0], v1[m1], c_v[m2]])
    _bit_scatter(bits, offs, np.full(len(offs), 6), vals)
    smp0 = sf0 + 6 * nsf.sum(axis=1)                     # [F]

    # samples: per (sb, ch-slot) pair, grouped (one field) or 3 fields,
    # layout repeating every granule
    lv_tbl = np.zeros((sblimit, max(len(t) for t in table)), dtype=np.int64)
    for sb in range(sblimit):
        lv_tbl[sb, :len(table[sb])] = table[sb]
    psb = np.array([sb for sb, _ in pairs])
    pch = np.array([ch for _, ch in pairs])
    n = lv_tbl[psb, alloc_idx[:, pch, psb]]              # [F, P] levels
    grouped = (n == 3) | (n == 5) | (n == 9)
    gb = np.where(n == 3, 5, np.where(n == 5, 7, 10))
    nb = np.zeros_like(n)
    nz = n > 0
    nb[nz] = np.ceil(np.log2(n[nz] + 1)).astype(np.int64)  # code_bits
    W = np.where(n == 0, 0, np.where(grouped, gb, 3 * nb))  # [F, P]
    intra = np.cumsum(W, axis=1) - W
    gran = W.sum(axis=1)                                 # bits per granule
    cd = codes[:, pch, :, psb].astype(np.int64)          # [P, F, 36]
    cd = np.transpose(cd, (1, 0, 2))                     # [F, P, 36]
    g12 = np.arange(GRANULES, dtype=np.int64)
    # [F, P, 12] field offsets (granule-major repeats)
    off_g = (fb0[:, None, None] + smp0[:, None, None]
             + g12[None, None, :] * gran[:, None, None]
             + intra[:, :, None])
    v0 = cd[:, :, 0::3]
    v1 = cd[:, :, 1::3]
    v2 = cd[:, :, 2::3]
    mg = np.broadcast_to(grouped[:, :, None], off_g.shape)
    mu = np.broadcast_to((nz & ~grouped)[:, :, None], off_g.shape)
    gw = np.broadcast_to(gb[:, :, None], off_g.shape)
    uw = np.broadcast_to(nb[:, :, None], off_g.shape)
    n3 = np.broadcast_to(n[:, :, None], off_g.shape)
    offs = np.concatenate([
        off_g[mg], off_g[mu], (off_g + uw)[mu], (off_g + 2 * uw)[mu]])
    widths = np.concatenate([gw[mg], uw[mu], uw[mu], uw[mu]])
    vals = np.concatenate([
        (v0 + n3 * (v1 + n3 * v2))[mg], v0[mu], v1[mu], v2[mu]])
    _bit_scatter(bits, offs, widths, vals)
    return np.packbits(bits).tobytes()


def _unpack_native(data: bytes, frames, hdr0: Mp2Header,
                   codes: np.ndarray, levels: np.ndarray,
                   sfidx: np.ndarray) -> bool:
    """One-call C++ unpack of all frames; False if the core is unavailable.

    Raises ValueError on a truncated frame (same contract as the Python
    path)."""
    import ctypes

    from .. import native
    lib = native.load()
    if lib is None:
        return False
    offsets = np.array([off for off, _ in frames], dtype=np.int64)
    sizes = np.array([len(fr) for _, fr in frames], dtype=np.int32)
    # mode_ext (hence the joint-stereo bound) varies per frame
    bounds = np.array([parse_header(fr).bound for _, fr in frames],
                      dtype=np.int32)
    table = T.ALLOC_TABLES[hdr0.table_id]
    nbal = np.array([(len(cl) - 1).bit_length() for cl in table],
                    dtype=np.int32)
    classes = np.zeros((hdr0.sblimit, 16), dtype=np.int32)
    for sb, cl in enumerate(table):
        classes[sb, :len(cl)] = cl
    buf = np.frombuffer(data, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.cri_mp2_unpack_frames(
        buf.ctypes.data_as(u8p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(i32p), np.int32(len(frames)),
        np.int32(hdr0.nch), np.int32(hdr0.sblimit),
        bounds.ctypes.data_as(i32p),
        np.int32(1 if hdr0.crc else 0),
        nbal.ctypes.data_as(i32p), classes.ctypes.data_as(i32p),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        levels.ctypes.data_as(i32p),
        sfidx.ctypes.data_as(u8p))
    if rc < 0:
        raise ValueError("Layer II frame truncated mid-field.")
    return True
