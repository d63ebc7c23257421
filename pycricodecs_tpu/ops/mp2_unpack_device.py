"""Device-side (Pallas) MPEG Layer II frame unpacker for the AHX codec.

Layer II is far friendlier to SPMD unpacking than HCA: the bit-allocation
section has STATIC field widths, and every later offset is a closed-form
prefix sum — scfsi presence counts, scalefactor widths from scfsi, and the
sample section repeats one per-granule layout 12 times. No serial symbol
scan exists at all. The kernel therefore VECTORISES OVER FIELD SLOTS: all
(subband, channel) rows form one [R, 8, 128] tensor (frames ride the
(sublane, lane) axes as in ops/hca_unpack_device), offsets come from one
`cumsum` per phase, and each phase reads through a single one-hot extract
over the frame's VMEM-resident word span — a few hundred traced ops total
(a straightforward per-field unroll compiled for >28 minutes).

Scope: every Layer II mode.  Joint (intensity) stereo's per-frame `bound`
(from the header's mode_extension bits) changes which fields exist per
frame: rows for (sb >= bound, ch 1) get width 0 in every prefix sum, the
alloc phase switches from static word funnels to the same extract()
pattern the later phases use, and shared sample/alloc values route to
channel 1 with a `bound > sb` select at store time.  CPU runs keep the
host unpacker (mp2_frame.unpack).

Bit-exactness: integer-only; semantics mirror mp2_frame._read_side_info /
_frame_field_layout (locked against libtwolame/libmpg123 oracles in
tests/test_ahx.py). The host path raises on truncated frames; the kernel
returns a per-frame `err` flag instead.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import mp2_tables as T

GRANULES = 12


class Mp2DeviceUnpacker:
    """Per-config compiled Layer II unpacker. Call with uint8
    [N, fs_max] stacked frames (each frame zero-padded to fs_max)."""

    _FR = 1024  # frames per block: (8 sublanes, 128 lanes)

    def __init__(self, hdr):
        self.joint = int(hdr.mode) == 1
        self.nch = int(hdr.nch)
        self.sblimit = int(hdr.sblimit)
        self.crc = bool(hdr.crc)
        self.fs_base = int(hdr.frame_size) - int(hdr.padding)
        self.fs_max = self.fs_base + 1
        self.table = [list(row) for row in T.ALLOC_TABLES[hdr.table_id]]
        self.nbal = [(len(row) - 1).bit_length() for row in self.table]
        self.wn = -(-self.fs_max // 4) + 2
        self._jit = jax.jit(self._unpack, static_argnames=("interpret",))

    def _take(self, row_consts, idx):
        """Static table-row lookup as a select tree (exact)."""
        vals = [jnp.int32(v) for v in row_consts]
        m = 1 << max((len(vals) - 1).bit_length(), 0)
        vals = vals + [vals[-1]] * (m - len(vals))
        bit = 0
        while len(vals) > 1:
            b = ((idx >> bit) & 1) == 1
            vals = [jnp.where(b, vals[2 * i + 1], vals[2 * i])
                    for i in range(len(vals) // 2)]
            bit += 1
        return vals[0]

    @staticmethod
    def _code_bits(n):
        """code_bits(levels): smallest b with 2^b - 1 >= levels (<= 65535),
        as threshold compares."""
        b = jnp.ones(n.shape, jnp.int32)
        for k in range(1, 16):
            b = b + (n > ((1 << k) - 1))
        return b

    def _unpack(self, frames_u8, B=1, interpret=False):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        N = frames_u8.shape[0]
        FR = self._FR
        NB = -(-N // FR)
        Np = NB * FR
        if Np != N:
            frames_u8 = jnp.pad(frames_u8, ((0, Np - N), (0, 0)))
        WN, C, SB = self.wn, self.nch, self.sblimit
        R = SB * C                                  # rows: sb-major, ch
        pad_b = jnp.zeros((Np, WN * 4 - self.fs_max), dtype=jnp.uint8)
        b = jnp.concatenate([frames_u8, pad_b], axis=1).reshape(Np, WN, 4)
        le = jax.lax.bitcast_convert_type(b, jnp.uint32)
        wa = ((le << 24) | ((le & jnp.uint32(0xFF00)) << 8)
              | ((le >> 8) & jnp.uint32(0xFF00)) | (le >> 24))
        wa3 = wa.reshape(NB, 8, 128, WN).transpose(0, 3, 1, 2)
        side_base = 48 if self.crc else 32
        fs_base8 = self.fs_base * 8
        joint = self.joint
        # alloc-section length: static unless joint stereo, where channel 1
        # rows exist only below the per-frame bound in [4, min(16, SB)]
        if joint:
            alloc_min = side_base + sum(nb for nb in self.nbal) \
                + sum(self.nbal[:min(4, SB)])
            alloc_max = side_base + sum(nb for nb in self.nbal) \
                + sum(self.nbal[:min(16, SB)])
        else:
            alloc_min = alloc_max = side_base + self.nch * sum(self.nbal)
        # static word spans per phase (scfsi <= 2R bits; sf <= 18R more)
        al_w0 = side_base >> 5
        al_wn = min(WN - al_w0,
                    (alloc_max - (al_w0 << 5) + 31 + 31) // 32 + 1)
        sc_w0 = alloc_min >> 5
        sc_wn = min(WN - sc_w0,
                    (alloc_max - (sc_w0 << 5) + 2 * R + 31 + 31) // 32 + 1)
        sf_w0 = sc_w0
        sf_wn = min(WN - sf_w0,
                    (alloc_max - (sf_w0 << 5) + 20 * R + 31 + 31) // 32 + 2)
        table, nbal = self.table, self.nbal

        def kernel(wa_ref, codes_ref, lev_ref, sfi_ref, err_ref, lv_s,
                   aux_s):
            g = pl.program_id(1)
            w0 = wa_ref[0, 0]
            fs_bits = (fs_base8 + ((w0 >> 9) & 1).astype(jnp.int32) * 8)
            if joint:
                # first jointly-coded subband, per frame (header mode_ext)
                bound = jnp.minimum(
                    (((w0 >> 4) & 3).astype(jnp.int32) + 1) * 4, SB)
                # row exists in the bitstream: always for ch 0, below the
                # bound for ch 1 (shared fields are read once)
                exists = jnp.stack(
                    [jnp.broadcast_to(bound > sb if ch else
                                      jnp.bool_(True), (8, 128))
                     for sb in range(SB) for ch in range(C)])

            def extract(w_base, n_words, offs, count):
                """`count` bits at absolute bit offsets `offs` (vectors of
                any shape broadcastable with [8, 128]); the span
                [w_base, w_base + n_words) must cover every read. Reads
                crossing the frame end return 0 (the host raises; callers
                carry the per-frame err flag instead)."""
                widx = (offs >> 5) - w_base
                oo = (offs & 31).astype(jnp.uint32)
                hi = jnp.zeros(offs.shape, jnp.uint32)
                lo = jnp.zeros(offs.shape, jnp.uint32)
                for k in range(n_words):
                    wk = wa_ref[0, w_base + k]
                    hi = hi + jnp.where(widx == k, wk, jnp.uint32(0))
                    if k:
                        lo = lo + jnp.where(widx == k - 1, wk,
                                            jnp.uint32(0))
                left = (hi << oo) | jnp.where(
                    oo > 0, lo >> (jnp.uint32(32) - oo), jnp.uint32(0))
                count = jnp.broadcast_to(jnp.asarray(count, jnp.int32),
                                         offs.shape)
                shift = (32 - jnp.clip(count, 0, 31)).astype(jnp.uint32)
                val = (left >> shift).astype(jnp.int32) & \
                    (jnp.left_shift(1, count) - 1)
                ok = (offs + count <= fs_bits) & (count > 0)
                return jnp.where(ok, val, 0)

            def field_widths(lev):
                n = lev
                grouped = (n == 3) | (n == 5) | (n == 9)
                gb = jnp.where(n == 3, 5, jnp.where(n == 5, 7, 10))
                nbv = self._code_bits(n)
                w_f = jnp.where(n == 0, 0,
                                jnp.where(grouped, gb, 3 * nbv))
                return grouped, gb, nbv, w_f

            @pl.when(g == 0)
            def _():
                if not joint:
                    # --- bit allocation: STATIC offsets, direct word
                    # funnels
                    lev_rows = []
                    off = side_base
                    for sb in range(SB):
                        for ch in range(C):
                            nb = nbal[sb]
                            q, o = off >> 5, off & 31
                            hi = wa_ref[0, q]
                            if o:
                                left = (hi << o) | (wa_ref[0, q + 1]
                                                    >> (32 - o))
                            else:
                                left = hi
                            idx = (left >> (32 - nb)).astype(jnp.int32) \
                                & ((1 << nb) - 1)
                            idx = jnp.where(off + nb <= fs_bits, idx, 0)
                            lev_rows.append(self._take(table[sb], idx))
                            off += nb
                    alloc_end = jnp.broadcast_to(
                        jnp.int32(off), (8, 128))
                else:
                    # --- bit allocation, joint stereo: offsets depend on
                    # the per-frame bound, so use the same prefix-sum +
                    # extract() pattern as the later phases (absent rows
                    # read 0 bits)
                    w_al = [jnp.where(exists[r], nbal[r // C], 0)
                            for r in range(R)]
                    pre = jnp.zeros((8, 128), jnp.int32)
                    offs_rows = []
                    for r in range(R):
                        offs_rows.append(side_base + pre)
                        pre = pre + w_al[r]
                    idxs = extract(al_w0, al_wn, jnp.stack(offs_rows),
                                   jnp.stack(w_al))
                    lev_rows = []
                    for sb in range(SB):
                        for ch in range(C):
                            lv = self._take(table[sb], idxs[sb * C + ch])
                            if ch:
                                # shared field: channel 0's value applies
                                lv = jnp.where(bound > sb, lv,
                                               lev_rows[sb * C])
                            lev_rows.append(lv)
                    alloc_end = side_base + pre
                lev = jnp.stack(lev_rows)          # [R, 8, 128]
                err = alloc_end > fs_bits
                lv_s[:, :, :] = lev
                # static row stores (in-kernel reshape+transpose of the
                # row-major layout may not lower in Mosaic)
                for sb in range(SB):
                    for ch in range(C):
                        lev_ref[0, ch, sb] = lev_rows[sb * C + ch]

    # --- scfsi: 2 bits per present field; offsets by python-level
                # row prefixes (a cumsum over the row axis may not lower
                # in Mosaic)
                present = lev > 0
                w2 = jnp.where(present, 2, 0)
                pre = jnp.zeros((8, 128), jnp.int32)
                offs_rows = []
                for r in range(R):
                    offs_rows.append(alloc_end + pre)
                    pre = pre + w2[r]
                offs = jnp.stack(offs_rows)
                scfsi = extract(sc_w0, sc_wn, offs, w2)
                sc_end = alloc_end + pre

                # --- scalefactors: widths from scfsi
                w_sf = jnp.where(present,
                                 jnp.where(scfsi == 0, 18,
                                           jnp.where(scfsi == 2, 6, 12)),
                                 0)
                pre = jnp.zeros((8, 128), jnp.int32)
                offs_rows = []
                for r in range(R):
                    offs_rows.append(sc_end + pre)
                    pre = pre + w_sf[r]
                offs = jnp.stack(offs_rows)
                c6 = jnp.where(present, 6, 0)
                r0 = extract(sf_w0, sf_wn, offs, c6)
                r1 = extract(sf_w0, sf_wn, offs + 6, c6)
                r2 = extract(sf_w0, sf_wn, offs + 12, c6)
                a = r0
                bv = jnp.where((scfsi == 0) | (scfsi == 3), r1, r0)
                cv = jnp.where(scfsi == 0, r2,
                               jnp.where(scfsi == 2, r0, r1))
                sfp = jnp.stack([a, bv, cv])       # [3, R, 8, 128]
                sfp = jnp.where(present[None], sfp, 0)
                for sb in range(SB):
                    for ch in range(C):
                        for k in range(3):
                            sfi_ref[0, ch, k, sb] = sfp[k, sb * C + ch]
                sf_end = sc_end + pre

                # --- per-granule width + truncation check (the host
                # raises ValueError anywhere a read crosses the frame end;
                # offsets are monotone so the final bound covers them all)
                _g, _gb, _nb, w_f = field_widths(lev)
                if joint:
                    w_f = jnp.where(exists, w_f, 0)
                gran_w = jnp.zeros((8, 128), jnp.int32)
                for r in range(R):
                    gran_w = gran_w + w_f[r]
                err = err | (sf_end + GRANULES * gran_w > fs_bits)
                err_ref[0, 0] = err.astype(jnp.int32)
                aux_s[0] = sf_end
                aux_s[1] = gran_w

            # --- samples for granule g (every grid step, incl. 0)
            lev = lv_s[:, :, :]
            grouped, gb, nbv, w_f = field_widths(lev)
            if joint:
                w_f = jnp.where(exists, w_f, 0)
            base = aux_s[0] + g * aux_s[1]
            pre = jnp.zeros((8, 128), jnp.int32)
            offs_rows = []
            for r in range(R):
                offs_rows.append(base + pre)
                pre = pre + w_f[r]
            offs = jnp.stack(offs_rows)
            live = (lev != 0) & exists if joint else (lev != 0)
            vg = extract(0, WN, offs, jnp.where(grouped & live, gb, 0))
            cu = jnp.where(live & ~grouped, nbv, 0)
            u0 = extract(0, WN, offs, cu)
            u1 = extract(0, WN, offs + cu, cu)
            u2 = extract(0, WN, offs + 2 * cu, cu)

            # grouped split: c % n, (c // n) % n, c // n^2 with n in
            # {3, 5, 9} -> select among constant-divisor results (exact)
            def div_n(c):
                d = jnp.where(lev == 3, c // 3,
                              jnp.where(lev == 5, c // 5, c // 9))
                return c - d * jnp.where(lev == 3, 3,
                                         jnp.where(lev == 5, 5, 9)), d
            c0g, q1 = div_n(vg)
            c1g, q2 = div_n(q1)
            codes = jnp.stack([jnp.where(grouped, c0g, u0),
                               jnp.where(grouped, c1g, u1),
                               jnp.where(grouped, q2, u2)])
            for sb in range(SB):
                for ch in range(C):
                    for k in range(3):
                        v = codes[k, sb * C + ch]
                        if joint and ch:
                            # shared samples above the bound scatter to
                            # both channels
                            v = jnp.where(bound > sb, v,
                                          codes[k, sb * C])
                        codes_ref[0, 0, ch, k, sb] = v

        mem_kw = dict(memory_space=pltpu.VMEM)
        codes, lev, sfi, errs = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((NB, GRANULES, C, 3, SB, 8, 128),
                                     jnp.int32),
                jax.ShapeDtypeStruct((NB, C, SB, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((NB, C, 3, SB, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.int32),
            ),
            grid=(NB, GRANULES),
            in_specs=[
                pl.BlockSpec((1, WN, 8, 128), lambda b, g: (b, 0, 0, 0),
                             **mem_kw),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, C, 3, SB, 8, 128),
                             lambda b, g: (b, g, 0, 0, 0, 0, 0), **mem_kw),
                pl.BlockSpec((1, C, SB, 8, 128),
                             lambda b, g: (b, 0, 0, 0, 0), **mem_kw),
                pl.BlockSpec((1, C, 3, SB, 8, 128),
                             lambda b, g: (b, 0, 0, 0, 0, 0), **mem_kw),
                pl.BlockSpec((1, 1, 8, 128), lambda b, g: (b, 0, 0, 0),
                             **mem_kw),
            ),
            scratch_shapes=[pltpu.VMEM((R, 8, 128), jnp.int32),
                            pltpu.VMEM((2, 8, 128), jnp.int32)],
            interpret=interpret,
        )(wa3)
        # frames-major epilogue for mp2_kernels
        codes = codes.transpose(0, 5, 6, 2, 1, 3, 4) \
            .reshape(Np, C, GRANULES * 3, SB)
        lev = lev.transpose(0, 3, 4, 1, 2).reshape(Np, C, SB)
        sfi = sfi.transpose(0, 4, 5, 1, 2, 3).reshape(Np, C, 3, SB)
        errs = errs.reshape(Np)
        return (codes[:N], lev[:N], sfi[:N], errs[:N] != 0)

    def __call__(self, frames_u8, B=1, interpret=False):
        return self._jit(frames_u8, B=B, interpret=interpret)
