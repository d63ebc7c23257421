"""Device-side (JAX) HCA frame packer: encode tensors -> frame bytes in HBM.

The inverse of ops/hca_unpack_device.py, completing the link-free on-chip
encode pipeline (reference: PackFrame, /root/reference/CriCodecs/hca.cpp:
2894-2963, plus the MSB-first BitWriter in IO.cpp).

TPU formulation (no gathers, no scatters, no scans):

- Every frame is the SAME statically-known sequence of N (value, bits)
  symbols: sync(16) + anl/evb(16), then per channel the 3-bit delta-width,
  the coded_count scalefactor codes (raw 6-bit / delta / escape+raw), the
  8x4-bit intensity or hfr_group x 6-bit scales, then 8 x coded_count
  spectrum VLCs.  Only the VALUES and WIDTHS are data-dependent — the
  sequence is fixed by the header config, so (value, bits) build as plain
  elementwise tensors [B, F, N] (packed-nibble table muxes for the <8
  resolutions, closed form bits = res - 4 + sign for >= 8).

- Bit offsets are an exclusive prefix sum of the widths.  Each symbol
  (<= 16 bits) spans at most two u32 words: its contribution splits into
  (hi -> word off>>5, lo -> word (off>>5)+1) with clamped shifts.

- The symbol->word "scatter" is a monotone threshold reduction: offsets are
  nondecreasing, so  word_hi[w] = sum_n hi_n * [w_n == w]  is the adjacent
  difference of  A[t] = sum_n hi_n * [w_n < t]  — a compare+multiply reduce
  over the static threshold axis.  Bit ranges are disjoint (every output bit
  is written at most once), so modular u32 sums ARE the bitwise OR.

- CRC16 (poly 0x8005) is linear over GF(2): crc bit j is the parity of
  sum_w popcount(words[w] & M[w, j]) against a static mask table — one
  fused reduction, no byte-serial state loop and no per-bit expansion.

Semantics locked against ops/hca_frame.py::pack_frame by byte-parity tests
(tests/test_pack_device.py).  End-of-frame contract (subtle, found by a
differential campaign): the host/reference writer's buffer is fs-2 bytes
placed at frame offset 2, so its writable range in FRAME bit coordinates is
[16, fs*8) — the final 16 writable bits overlap the CRC slot.  A symbol may
legitimately START in the last data byte and END inside the CRC slot: its
leading bits are real payload (frame bytes [.., fs-2)) and the spill is
overwritten by the CRC afterwards.  The keep mask therefore bounds symbols
by fs*8, NOT fs*8-16 (dropping crossing symbols entirely loses their
leading payload bits — observed at 48 kHz q=0, frame_size 1024, where the
last scalefactor-delta ends 1 bit past the data region).  Spilled bits are
harmless downstream: _crc_word_table zeroes contributions for message
bytes >= fs-2, the payload slice cuts bytes >= fs-2, and a symbol ending
<= fs*8 never scatters past word W-1 (its end maps inside the last word).
Writes that cross fs*8 itself ARE dropped whole without advancing the
cursor (IO.cpp Write semantics) — unreachable after rate control, which
reroutes failures (level < 0) to the host encoder before packing.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import hca_tables as T
from .hca_unpack_device import _mux8, _nib16
from ..utils.crc import CRC16_TABLE

u32 = jnp.uint32
i32 = jnp.int32

STEREO_SECONDARY = 2


def _pack_rows(table):
    """[8,16] nibble table -> (lo, hi) packed u32 rows (values <= 15)."""
    lo, hi = [], []
    for row in np.asarray(table, np.int64):
        l = h = 0
        for c in range(8):
            l |= int(row[c]) << (4 * c)
            h |= int(row[c + 8]) << (4 * c)
        lo.append(l)
        hi.append(h)
    return lo, hi


_QSB_LO, _QSB_HI = _pack_rows(T.QUANTIZE_SPECTRUM_BITS)
_QSV_LO, _QSV_HI = _pack_rows(T.QUANTIZE_SPECTRUM_VALUE)


def _crc_word_table(fs: int, nwords: int) -> np.ndarray:
    """K[w, t] u16: CRC16 contribution of bit t (LSB order) of output word w.

    CRC16 is GF(2)-linear, so crc(frame[:fs-2]) = XOR over set message bits
    of the per-position unit contribution.  Contribution depends only on the
    distance from the message end: D[d, k] = crc16 of byte (1 << k) followed
    by d zero bytes, built with the same table recurrence as utils/crc.py.
    """
    L = fs - 2  # CRC covers frame[:fs-2] (sync + payload), crc.py semantics
    table = CRC16_TABLE.astype(np.uint32)
    # D[d, k]: state after processing byte (1<<k) then d zero bytes
    D = np.zeros((L, 8), dtype=np.uint32)
    state = np.array([table[1 << k] for k in range(8)], dtype=np.uint32)
    D[0] = state
    for d in range(1, L):
        state = ((state << 8) ^ table[(state >> 8) & 0xFF]) & 0xFFFF
        D[d] = state
    K = np.zeros((nwords, 32), dtype=np.uint32)
    for w in range(nwords):
        for i in range(4):           # big-endian byte i of word w
            j = 4 * w + i            # message byte position
            if j >= L:
                continue
            for k in range(8):       # bit k (LSB) of that byte
                K[w, 24 - 8 * i + k] = D[L - 1 - j, k]
    return K


def _crc_mask_table(fs: int, nwords: int) -> np.ndarray:
    """M[w, j] u32: mask of word-w bits whose CRC contribution sets bit j.

    The bit-transpose of _crc_word_table: crc bit j = parity of
    sum_w popcount(words[w] & M[w, j]).  Folding through popcount+sum keeps
    the whole checksum a single reduction over [B, F, W, 16] WITHOUT
    materialising the [B, F, W, 32] per-bit expansion the direct
    formulation needs (~8 GB of HBM traffic per 256-stream bank).
    """
    K = _crc_word_table(fs, nwords)                     # [W, 32]
    M = np.zeros((nwords, 16), dtype=np.uint32)
    for w in range(nwords):
        for t in range(32):
            v = int(K[w, t])
            for j in range(16):
                if (v >> j) & 1:
                    M[w, j] |= np.uint32(1 << t)
    return M


def _spectrum_symbols(res, quant):
    """(value, bits) u32 for every spectrum slot. res u8/i32, quant i16.

    reference hca.cpp:2938-2957: res 0 emits nothing; 1..7 use the
    QUANTIZE_SPECTRUM_VALUE/BITS nibble tables at q+8; 8..15 write |q| in
    (QUANTIZED_SPECTRUM_MAX_BITS[res]-1 == res-4) bits plus a sign bit when
    q != 0.
    """
    r = res.astype(i32)[..., None, :]   # broadcast bands over subframes
    q = quant.astype(i32)
    code = jnp.clip(q + 8, 0, 15)
    r8 = jnp.clip(r, 0, 7)
    v_lo = _nib16(_mux8(_QSV_LO, r8), _mux8(_QSV_HI, r8), code)
    b_lo = _nib16(_mux8(_QSB_LO, r8), _mux8(_QSB_HI, r8), code)
    base = r - 4                      # QUANTIZED_SPECTRUM_MAX_BITS[r] - 1
    nz = q != 0
    aq = jnp.abs(q)
    v_hi = jnp.where(nz, (aq << 1) | (q < 0).astype(i32), 0)
    b_hi = jnp.where(nz, base + 1, base)
    value = jnp.where(r >= 8, v_hi, jnp.where(r >= 1, v_lo, 0))
    bits = jnp.where(r >= 8, b_hi, jnp.where(r >= 1, b_lo, 0))
    return value.astype(u32), bits.astype(i32)


def _scalefactor_symbols(sf_c, db):
    """(value, bits) for one channel's coded scalefactors.

    sf_c i32 [B, F, cc], db i32 [B, F] (hca.cpp:2906-2920): width 0 emits
    nothing, width 6 raw codes, else sf[0] raw then deltas with
    (1<<db)-1 escape + raw 6-bit.
    """
    dbe = db[..., None]
    maxd = (1 << jnp.maximum(dbe - 1, 0)) - 1
    escape = (1 << dbe) - 1
    prev = jnp.concatenate([sf_c[..., :1], sf_c[..., :-1]], axis=-1)
    delta = sf_c - prev
    esc = jnp.abs(delta) > maxd
    v_delta = jnp.where(esc, (escape << 6) | sf_c, maxd + delta)
    b_delta = jnp.where(esc, dbe + 6, dbe)
    is_first = jnp.arange(sf_c.shape[-1]) == 0
    value = jnp.where(dbe == 6, sf_c, jnp.where(is_first, sf_c, v_delta))
    bits = jnp.where(dbe == 6, 6, jnp.where(is_first, 6, b_delta))
    value = jnp.where(dbe == 0, 0, value)
    bits = jnp.where(dbe == 0, 0, bits)
    return value.astype(u32), bits.astype(i32)


def _exclusive_prefix(bits):
    """Exclusive prefix sum over the last axis of i32 [B, F, N].

    jnp.cumsum lowers to ~log2(N) full-tensor passes (12 x 1.1 GB of HBM
    traffic per 256-stream bank — measured as the packer's second-largest
    wall).  Hierarchical instead: 32-symbol chunks get their local prefix
    from ONE exact 0/1 triangular matmul on the MXU (widths <= 16, frame
    totals <= fs*8 < 2^24, so f32 at precision=HIGHEST is exact), and only
    the tiny [B, F, K] chunk-total tensor rides a cumsum.
    """
    B, F, N = bits.shape
    S = 32
    K = -(-N // S)
    pad = K * S - N
    b = bits if not pad else jnp.concatenate(
        [bits, jnp.zeros((B, F, pad), bits.dtype)], axis=-1)
    b3 = b.reshape(B, F, K, S).astype(jnp.float32)
    tri = np.tril(np.ones((S, S), np.float32), k=-1).T  # [s, i] = s < i
    local = jnp.einsum("bfks,si->bfki", b3, jnp.asarray(tri),
                       precision=jax.lax.Precision.HIGHEST)
    tot = jnp.sum(b3, axis=-1)                          # [B, F, K]
    base = jnp.cumsum(tot, axis=-1) - tot
    off = (base[..., None] + local).astype(i32).reshape(B, F, K * S)
    return off[..., :N]


def _scatter_segments_pallas(rel, hi_c, lo_c, J, interpret=False):
    """Level-1 chunk-local threshold sums as a VMEM-resident Pallas kernel.

    The XLA formulation materialises the [B,F,K,S,J+1] compare/select
    masks through HBM (~94 GB per 256-stream bank — pack_scatter measured
    115 ms standalone, the packer's whale, PROFILE_r04); here each frame
    tile keeps its chunk symbols in VMEM and the whole reduce is ~20k VPU
    ops per 1024-frame tile. Frames ride the (sublane, lane) tile axes,
    thresholds and chunks are fori loops (static unrolls at this size blow
    Mosaic's trace budget — the MP2 ~40k-op compile lesson).

    rel i32 / hi_c, lo_c u32 [B, F, K, S] -> seg u32 [B, F, K, J].
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, K, S = rel.shape
    BF = B * F
    NBF = -(-BF // 1024)
    BFp = NBF * 1024
    # chunk-axis grid blocking: K is ~55 for stereo q2 frames (8 subframes
    # x C x coded_count spectrum symbols), so whole-K blocks blew scoped
    # vmem (48M measured); chunks are independent, KB=8 keeps ~7MB live
    KB = 8
    KN = -(-K // KB)
    Kp = KN * KB

    def lay(x):
        x = x.reshape(BF, K, S)
        # rel pads must keep rel >= 0 semantics: zero rows give acc 0
        x = jnp.pad(x, ((0, BFp - BF), (0, Kp - K), (0, 0)))
        return x.reshape(NBF, 8, 128, KN, KB, S).transpose(0, 3, 4, 5, 1, 2)

    rel_k, hi_k, lo_k = lay(rel), lay(hi_c), lay(lo_c)

    def kernel(rel_ref, hi_ref, lo_ref, seg_ref):
        def k_body(k, _c):
            rels = rel_ref[0, 0, k]                    # [S, 8, 128]
            # Mosaic has no unsigned reductions: sum in i32 — two's
            # complement wrap == mod-2^32 u32 sum, bit-identical
            his = hi_ref[0, 0, k].astype(i32)
            los = lo_ref[0, 0, k].astype(i32)

            def t_body(t, aprev):
                thr = t + 1
                acc = jnp.sum(jnp.where(rels < thr, his, i32(0)), axis=0) \
                    + jnp.sum(jnp.where(rels + 1 < thr, los, i32(0)),
                              axis=0)
                seg_ref[0, 0, k, t] = (acc - aprev).astype(u32)
                return acc

            jax.lax.fori_loop(0, J, t_body,
                              jnp.zeros((8, 128), i32))
            return _c

        jax.lax.fori_loop(0, KB, k_body, jnp.int32(0))

    mem = dict(memory_space=pltpu.VMEM)
    seg_k = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NBF, KN, KB, J, 8, 128), u32),
        grid=(NBF, KN),
        in_specs=[
            pl.BlockSpec((1, 1, KB, S, 8, 128),
                         lambda b, kc: (b, kc, 0, 0, 0, 0), **mem),
            pl.BlockSpec((1, 1, KB, S, 8, 128),
                         lambda b, kc: (b, kc, 0, 0, 0, 0), **mem),
            pl.BlockSpec((1, 1, KB, S, 8, 128),
                         lambda b, kc: (b, kc, 0, 0, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, 1, KB, J, 8, 128),
                               lambda b, kc: (b, kc, 0, 0, 0, 0), **mem),
        interpret=interpret,
    )(rel_k, hi_k, lo_k)
    seg = seg_k.reshape(NBF, Kp, J, 8, 128) \
        .transpose(0, 3, 4, 1, 2).reshape(BFp, Kp, J)[:BF, :K]
    return seg.reshape(B, F, K, J)


def _scatter_words(w_n, hi, lo, W, max_sym_bits=16, pallas_mode=None):
    """Monotone symbol->word scatter, two-level: [B,F,N] -> [B,F,W] u32.

    Level 1 (VPU): symbols in chunks of S=32; within a chunk, word indices
    span J words from the chunk's first word, so local threshold sums
    (A[t] = sum hi*[rel < t], adjacent-differenced) cost N x (J+1) instead
    of N x (W+1).  The lo halves land at rel+1 and fold into the same pass.
    Modular u32 sums equal the bitwise OR because written bit ranges are
    disjoint.  J is sized from `max_sym_bits`, the widest NON-HEADER symbol
    the caller can emit (the two 16-bit header symbols at the start of
    chunk 0 are accounted separately): HCA's widest is the 13-bit
    scalefactor escape (delta_bits 7 + raw 6; spectrum codes <= 12), so it
    passes 13 and shaves the threshold axis 19 -> 17.  A symbol wider than
    the bound would silently DROP from the scatter — callers own the bound.

    Level 2 (MXU): each chunk contributes one contiguous 18-word segment at
    its (monotone) base word.  Placement = byte-planes of the segments
    against a {0,1} base-word one-hot, as 4 exact f32 matmuls
    (einsum 'bfkj,bfkw->bfjw'): plane values <= 255 are exact in bf16
    multiplicands and partial sums stay < 2^24, so the default TPU matmul
    precision is bit-exact here.  A final static diagonal fold
    out[w] += X[j, w-j] recombines the planes and segments.

    This replaces the direct N x (W+1) threshold reduce (~150 GB of fused
    compare-select traffic per 256-stream bank, the packer's hot spot).
    """
    B, F, N = w_n.shape
    S = 32
    K = -(-N // S)
    pad = K * S - N
    if pad:
        # zero-width padding symbols: value 0 everywhere, index tied to the
        # last real symbol so chunk-local offsets stay in range
        w_n = jnp.concatenate(
            [w_n, jnp.broadcast_to(w_n[..., -1:], (B, F, pad))], axis=-1)
        hi = jnp.concatenate([hi, jnp.zeros((B, F, pad), hi.dtype)], axis=-1)
        lo = jnp.concatenate([lo, jnp.zeros((B, F, pad), lo.dtype)], axis=-1)
    w_c = w_n.reshape(B, F, K, S)
    hi_c = hi.reshape(B, F, K, S)
    lo_c = lo.reshape(B, F, K, S)
    base = w_c[..., 0]                                  # [B, F, K]
    rel = w_c - base[..., None]
    # worst chunk payload: 32 symbols of max_sym_bits, except chunk 0 whose
    # first two symbols are the 16-bit sync/header words; +31 start skew
    worst_bits = max(S * max_sym_bits, 2 * 16 + (S - 2) * max_sym_bits)
    J = ((31 + worst_bits - 1) >> 5) + 2                # local word span
    if pallas_mode in ("tpu", "interpret"):
        seg = _scatter_segments_pallas(rel, hi_c, lo_c, J,
                                       interpret=pallas_mode == "interpret")
    else:
        thr = jnp.arange(J + 1, dtype=i32)              # [J+1]
        # (measured on-chip: a K-on-lanes transpose of this reduce is ~8%
        # SLOWER than the natural layout — XLA's layout assignment wins)
        m_hi = rel[..., None] < thr                     # [B,F,K,S,J+1]
        m_lo = (rel + 1)[..., None] < thr
        A = jnp.sum(jnp.where(m_hi, hi_c[..., None], u32(0)), axis=-2) \
            + jnp.sum(jnp.where(m_lo, lo_c[..., None], u32(0)), axis=-2)
        seg = A[..., 1:] - A[..., :-1]                  # [B, F, K, J] u32

    # byte planes -> exact f32 matmul placement against the base one-hot
    planes = jax.lax.bitcast_convert_type(seg, jnp.uint8)  # [B,F,K,J,4]
    planes = planes.reshape(B, F, K, J * 4).astype(jnp.float32)
    onehot = (base[..., None]
              == jnp.arange(W, dtype=i32)).astype(jnp.float32)
    X = jnp.einsum("bfkj,bfkw->bfjw", planes, onehot)   # [B,F,J*4,W]
    Xw = X.astype(u32).reshape(B, F, J, 4, W)
    Xw = (Xw[..., 0, :] | (Xw[..., 1, :] << 8)
          | (Xw[..., 2, :] << 16) | (Xw[..., 3, :] << 24))  # [B,F,J,W]
    # diagonal fold: word w accumulates segment offset j placed at w - j
    words = Xw[..., 0, :]
    for j in range(1, J):
        words = words + jnp.concatenate(
            [jnp.zeros((B, F, j), u32), Xw[..., j, :W - j]], axis=-1)
    return words


@partial(jax.jit, static_argnames=("channels", "coded_counts",
                                   "channel_types", "hfr_group_count",
                                   "frame_size", "pallas_mode"))
def pack_frames_device(level, boundary, sf, res, intensity, hfr_scales,
                       delta_bits, quant, *, channels, coded_counts,
                       channel_types, hfr_group_count, frame_size,
                       pallas_mode=None):
    """Pack frames on device: encode tensors -> u8 [B, F, frame_size].

    level/boundary i32 [B,F]; sf/res u8 [B,F,C,128]; intensity u8 [B,F,C,8];
    hfr_scales i32 [B,F,C,G]; delta_bits i32 [B,F,C]; quant i16 [B,F,C,8,128].
    Output frames are byte-identical to ops/hca_frame.py::pack_frame.
    """
    C = channels
    G = hfr_group_count
    fs = frame_size
    B, F = level.shape

    values = [jnp.broadcast_to(u32(0xFFFF), (B, F))[..., None]]
    widths = [jnp.broadcast_to(i32(16), (B, F))[..., None]]

    hdr = ((level.astype(i32) & 0x1FF) << 7) | (boundary.astype(i32) & 0x7F)
    values.append(hdr.astype(u32)[..., None])
    widths.append(jnp.broadcast_to(i32(16), (B, F))[..., None])

    sf_i = sf.astype(i32)
    for c in range(C):
        cc = int(coded_counts[c])
        db = delta_bits[..., c].astype(i32)
        values.append((db.astype(u32) & 7)[..., None])
        widths.append(jnp.broadcast_to(i32(3), (B, F))[..., None])
        v, b = _scalefactor_symbols(sf_i[..., c, :cc], db)
        values.append(v)
        widths.append(b)
        if channel_types[c] == STEREO_SECONDARY:
            values.append(intensity[..., c, :].astype(u32))
            widths.append(jnp.broadcast_to(i32(4), (B, F, 8)))
        elif G > 0:
            values.append(hfr_scales[..., c, :G].astype(u32))
            widths.append(jnp.broadcast_to(i32(6), (B, F, G)))

    v_spec, b_spec = _spectrum_symbols(res, quant)   # [B, F, C, 8, 128]
    # subframe-major, channel-minor, band-innermost (hca.cpp:2938-2941)
    v_spec = jnp.moveaxis(v_spec, 3, 2)              # [B, F, 8, C, 128]
    b_spec = jnp.moveaxis(b_spec, 3, 2)
    same_cc = len(set(int(x) for x in coded_counts[:C])) == 1
    if same_cc:
        cc = int(coded_counts[0])
        values.append(v_spec[..., :cc].reshape(B, F, 8 * C * cc))
        widths.append(b_spec[..., :cc].reshape(B, F, 8 * C * cc))
    else:
        for s in range(8):
            for c in range(C):
                cc = int(coded_counts[c])
                values.append(v_spec[:, :, s, c, :cc])
                widths.append(b_spec[:, :, s, c, :cc])

    value = jnp.concatenate(values, axis=-1)         # [B, F, N] u32
    bits = jnp.concatenate(widths, axis=-1)          # [B, F, N] i32
    # materialize the symbol tensors once: keeps XLA from fusing the whole
    # symbol-build chain into both downstream reduces (hi and lo) and
    # recomputing it per consumer
    value, bits = jax.lax.optimization_barrier((value, bits))

    # exclusive prefix sum -> bit offsets; symbols may end inside the CRC
    # slot (writer buffer spans [16, fs*8) in frame bits — see the module
    # docstring's end-of-frame contract); only writes crossing fs*8 itself
    # drop whole (BitWriter semantics, unreachable after rate control)
    off = _exclusive_prefix(bits)
    keep = (off + bits) <= (fs * 8)
    bcl = jnp.minimum(bits, 31)
    value = jnp.where(keep, value & ((u32(1) << bcl.astype(u32)) - 1), 0)

    # split each symbol into (hi -> word w, lo -> word w+1) contributions
    w_n = (off >> 5).astype(i32)
    rel = (off & 31).astype(i32)
    end = rel + bits
    sh_hi_le = jnp.clip(32 - end, 0, 31).astype(u32)   # end <= 32 case
    sh_hi_gt = jnp.clip(end - 32, 0, 31).astype(u32)   # end > 32 case
    hi = jnp.where(end <= 32, value << sh_hi_le, value >> sh_hi_gt)
    sh_lo = jnp.clip(64 - end, 0, 31).astype(u32)
    lo = jnp.where(end > 32, value << sh_lo, u32(0))
    # same fence: the offset/shift chain feeds two level-1 reduces
    w_n, hi, lo = jax.lax.optimization_barrier((w_n, hi, lo))

    W = -(-fs // 4)
    # widest non-header symbol: 13-bit scalefactor escape (delta_bits 7 +
    # raw 6); spectrum <= 12, hfr 6, intensity 4 (see _scatter_words)
    words = _scatter_words(w_n, hi, lo, W, max_sym_bits=13,
                           pallas_mode=pallas_mode)    # [B, F, W]

    # CRC16 over frame[:fs-2]: GF(2) linearity as parity-of-popcount —
    # crc bit j = parity(sum_w popcount(words_w & M[w, j])); the sum over
    # words fuses into one reduction, no per-bit expansion (bits spilled
    # into bytes fs-2.. by a CRC-slot-crossing symbol carry zero mask rows,
    # so they cannot perturb the checksum)
    # mask laid out [16, W]: the word axis (W = 128/256) rides the lanes
    # and the popcount reduce runs along it at full width ([W, 16] put the
    # 16 CRC bits on the lane axis — 12.5% utilisation)
    MT = jnp.asarray(_crc_mask_table(fs, W).T)        # [16, W] u32
    cnt = jnp.sum(jax.lax.population_count(words[..., None, :] & MT),
                  axis=-1, dtype=i32)                 # [B, F, 16]
    crc = jnp.sum((cnt & 1).astype(u32) << jnp.arange(16, dtype=u32),
                  axis=-1, dtype=u32)                 # disjoint bits: sum==or

    # big-endian byte layout (static 4-slice stack: no jnp.flip on this
    # backend — see CLAUDE.md TPU-plugin miscompilation note)
    le = jax.lax.bitcast_convert_type(words, jnp.uint8)  # [B, F, W, 4] LE
    be = jnp.stack([le[..., 3], le[..., 2], le[..., 1], le[..., 0]], axis=-1)
    payload = be.reshape(B, F, W * 4)[..., :fs - 2]
    crc_b = jnp.stack([(crc >> 8).astype(jnp.uint8),
                       (crc & 0xFF).astype(jnp.uint8)], axis=-1)
    return jnp.concatenate([payload, crc_b], axis=-1)


class DevicePacker:
    """Per-config compiled packer (config static args resolved once)."""

    def __init__(self, info):
        self._kw = dict(
            channels=int(info.channels),
            coded_counts=tuple(int(x) for x in info.coded_count),
            channel_types=tuple(int(x) for x in info.channel_type),
            hfr_group_count=int(info.hfr_group_count),
            frame_size=int(info.frame_size))

    def __call__(self, level, boundary, sf, res, intensity, hfr_scales,
                 delta_bits, quant):
        return pack_frames_device(
            jnp.asarray(level, i32), jnp.asarray(boundary, i32),
            jnp.asarray(sf), jnp.asarray(res), jnp.asarray(intensity),
            jnp.asarray(hfr_scales, i32), jnp.asarray(delta_bits, i32),
            jnp.asarray(quant), **self._kw)
