// Sanitizer harness for cricore.cpp: exercises CRILAYLA compress/decompress
// round-trips (compressible, repetitive, incompressible and tiny inputs) and
// CRC batching under ASan/UBSan. Build + run:
//   g++ -O1 -g -fsanitize=address,undefined -std=c++17 \
//       sanitize_check.cpp -o /tmp/cricore_san -lpthread && /tmp/cricore_san
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "cricore.cpp"

static void roundtrip(const std::vector<uint8_t>& src, const char* name) {
    uint32_t cap = (uint32_t)src.size() + (uint32_t)src.size() / 2 + 0x800;
    std::vector<uint8_t> comp(cap, 0);
    uint32_t n = cri_layla_compress(src.data(), (uint32_t)src.size(),
                                    comp.data(), cap);
    if (src.size() < 0x101) {
        assert(n == 0);
        printf("  %-14s -> rejected (too small) OK\n", name);
        return;
    }
    assert(n > 0x110);
    uint32_t dec_size, comp_size;
    std::memcpy(&dec_size, comp.data() + 8, 4);
    std::memcpy(&comp_size, comp.data() + 12, 4);
    std::vector<uint8_t> out(dec_size + 256);
    cri_layla_decompress(comp.data() + 16, comp_size, dec_size, out.data());
    assert(out.size() == src.size());
    assert(std::memcmp(out.data(), src.data(), src.size()) == 0);
    printf("  %-14s -> %u -> %zu bytes OK\n", name, n, out.size());
}

static void hostile_decompress() {
    // malformed streams must return -1 without reading outside the buffer
    // (the per-token underrun check alone cannot stop the 0xFF
    // length-extension loop from walking below the source)
    {   // all-0xFF stream: endless length extensions exhaust the reader
        std::vector<uint8_t> payload(3 + 256, 0xFF);
        std::vector<uint8_t> out(4096 + 256, 0);
        int64_t rc = cri_layla_decompress(payload.data(), 3, 4096, out.data());
        assert(rc == -1);
    }
    {   // compressed_size == 0: the very first bit pull is already below src
        std::vector<uint8_t> payload(256, 0xAB);
        std::vector<uint8_t> out(1024 + 256, 0);
        int64_t rc = cri_layla_decompress(payload.data(), 0, 1024, out.data());
        assert(rc == -1);
    }
    {   // back-reference past the buffer end
        std::vector<uint8_t> payload(8 + 256, 0);
        payload[7] = 0xFF;  // flag=1 + huge offset bits
        payload[6] = 0xFF;
        std::vector<uint8_t> out(16 + 256, 0);
        int64_t rc = cri_layla_decompress(payload.data(), 8, 16, out.data());
        assert(rc == -1);
    }
    {   // random garbage, many seeds: must never crash
        std::mt19937 rng(99);
        for (int t = 0; t < 200; t++) {
            uint32_t csize = 1 + rng() % 64;
            std::vector<uint8_t> payload(csize + 256);
            for (auto& b : payload) b = (uint8_t)rng();
            uint32_t dsize = 1 + rng() % 2048;
            std::vector<uint8_t> out(dsize + 256, 0);
            cri_layla_decompress(payload.data(), csize, dsize, out.data());
        }
    }
    printf("  hostile decompress cases OK\n");
}

static void mp2_unpack_cases() {
    // well-formed-ish and hostile Layer II frames must never read OOB
    std::mt19937 rng(123);
    const int sblimit = 30;
    int32_t nbal[30]; int32_t classes[30 * 16] = {0};
    for (int sb = 0; sb < 30; sb++) {
        nbal[sb] = sb < 4 ? 4 : (sb < 11 ? 3 : 2);
        int32_t lsf4[16] = {0,3,5,7,9,15,31,63,127,255,511,1023,2047,4095,
                            8191,16383};
        int32_t lsf3[8] = {0,3,5,9,15,31,63,127};
        int32_t lsf2[4] = {0,3,5,9};
        for (int i = 0; i < (1 << nbal[sb]); i++)
            classes[sb * 16 + i] = nbal[sb] == 4 ? lsf4[i]
                                   : (nbal[sb] == 3 ? lsf3[i] : lsf2[i]);
    }
    for (int t = 0; t < 300; t++) {
        int32_t fsize = 16 + (int32_t)(rng() % 640);
        std::vector<uint8_t> frame(fsize);
        for (auto& b : frame) b = (uint8_t)rng();
        std::vector<uint16_t> codes((size_t)1 * 1 * 36 * 32, 0);
        std::vector<int32_t> levels(32, 0);
        std::vector<uint8_t> sfidx((size_t)3 * 32, 0);
        int64_t off = 0;
        int32_t bound = sblimit;
        cri_mp2_unpack_frames(frame.data(), &off, &fsize, 1, 1, sblimit,
                              &bound, t & 1, nbal, classes,
                              codes.data(), levels.data(), sfidx.data());
    }
    printf("  mp2 unpack fuzz OK\n");
}

static void mp2_synthesize_cases() {
    // hostile SoA tensors (out-of-range codes/levels/sfidx — anything a
    // corrupt unpack could hand over) must never read OOB: sfidx is the
    // only indexing input and the sf table is 64 entries, so every uint8
    // must be clamped... it is NOT — the contract is sfidx < 64, which the
    // unpacker guarantees (6-bit reads); fuzz within that contract and
    // with extreme codes/levels values.
    std::mt19937 rng(0x3141);
    std::vector<double> sf(64), nt(32 * 64), dwin(512);
    for (auto& x : sf) x = (double)(rng() % 1000) / 500.0;
    for (auto& x : nt) x = (double)(int32_t)rng() / 2e9;
    for (auto& x : dwin) x = (double)(int32_t)rng() / 2e9;
    for (int t = 0; t < 20; t++) {
        int32_t F = 1 + (int32_t)(rng() % 7), C = 1 + (int32_t)(rng() % 2);
        std::vector<uint16_t> codes((size_t)F * C * 36 * 32);
        std::vector<int32_t> levels((size_t)F * C * 32);
        std::vector<uint8_t> sfidx((size_t)F * C * 3 * 32);
        for (auto& x : codes) x = (uint16_t)rng();
        for (auto& x : levels) x = (int32_t)(rng() % 70000) - 2;
        for (auto& x : sfidx) x = (uint8_t)(rng() % 64);
        std::vector<int16_t> pcm((size_t)C * F * 36 * 32);
        cri_mp2_synthesize(codes.data(), levels.data(), sfidx.data(), F, C,
                           sf.data(), nt.data(), dwin.data(), pcm.data());
    }
    printf("  mp2 synthesize fuzz OK\n");
}

static void hca_boundary_fuzz() {
    // Adversarial fuzz of the ctypes boundary: every header-reachable
    // parameter combination (channels at the 16 cap, any validated band
    // split, v1.x-v3.0, resolution ranges, random cipher tables) against
    // RANDOM frame content with forced sync+CRC so the unpack body runs
    // deep. Buffers are allocated with EXACTLY the sizes the Python wrapper
    // would pass (hca_frame.py:425-470: data is nframes*frame_size, a
    // truncated final frame never crosses the boundary) so ASan redzones
    // catch any
    // overread/overwrite the contract would allow. rc==0 outputs are
    // range-checked and then fed through cri_hca_decode_transform, the same
    // trust chain production uses.
    const uint8_t real_max_bit[16] = {0, 2, 3, 3, 4, 4, 4, 4,
                                      5, 6, 7, 8, 9, 10, 11, 12};
    std::mt19937 rng(0xC0DEC);
    int deep = 0;
    for (int t = 0; t < 400; t++) {
        const int C = 1 + (int)(rng() % 16);
        const int fs = 8 + (int)(rng() % 0x3F8);
        const int F = 1 + (int)(rng() % 6);
        const int versions[5] = {0x101, 0x102, 0x103, 0x200, 0x300};
        const int version = versions[rng() % 5];
        int base = (int)(rng() % 129);
        int stereo = (int)(rng() % (129 - base));
        int total = base + stereo + (int)(rng() % (129 - base - stereo));
        if (total > 128) total = 128;
        int bphg = 1 + (int)(rng() % 128);
        int rem = total - base - stereo;
        int hfr_groups = rem > 0 ? (rem / bphg + (rem % bphg ? 1 : 0)) : 0;
        int min_res = 1, max_res = 15;
        if (version > 0x200) {
            min_res = (int)(rng() % 16);
            max_res = min_res + (int)(rng() % (16 - min_res));
        }
        // frames: half fully random payloads (mostly rejected early), half
        // sparse corruptions of a zero frame (parse deep, random branches);
        // valid sync + CRC except an occasional bad-sync/bad-CRC case
        std::vector<uint8_t> frames((size_t)F * fs);
        if (t & 1) {
            for (auto& b : frames) b = (uint8_t)rng();
        } else {
            std::fill(frames.begin(), frames.end(), 0);
            for (int k = 0; k < F * fs / 6; k++)
                frames[rng() % frames.size()] = (uint8_t)rng();
        }
        for (int f = 0; f < F; f++) {
            uint8_t* p = frames.data() + (size_t)f * fs;
            if (rng() % 8 == 0) continue;  // bad sync / bad CRC path
            p[0] = 0xFF;
            p[1] = 0xFF;
            uint16_t crc = cri_crc16(p, fs - 2);
            p[fs - 2] = (uint8_t)(crc >> 8);
            p[fs - 1] = (uint8_t)crc;
        }
        std::vector<uint8_t> cipher(256);
        for (int i = 0; i < 256; i++) cipher[i] = (uint8_t)i;
        for (int i = 255; i > 0; i--)
            std::swap(cipher[i], cipher[rng() % (i + 1)]);
        std::vector<uint8_t> ctype(C);
        std::vector<int32_t> coded(C);
        for (int c = 0; c < C; c++) {
            ctype[c] = (uint8_t)(rng() % 3);
            coded[c] = ctype[c] == 2 ? base : base + stereo;
        }
        std::vector<uint8_t> ath(128);
        for (auto& b : ath) b = (uint8_t)rng();
        std::vector<uint8_t> invert(66);
        for (auto& b : invert) b = (uint8_t)(rng() % 16);
        std::vector<uint8_t> read_bit(128);
        for (auto& b : read_bit) b = (uint8_t)(rng() % 9);
        std::vector<int8_t> read_val(128);
        for (auto& v : read_val) v = (int8_t)((int)(rng() % 15) - 7);
        uint32_t rnd_state = (uint32_t)rng() | 1;
        const int need_noise = (min_res == 0);
        std::vector<int16_t> qc((size_t)F * C * 8 * 128);
        std::vector<uint8_t> sfs((size_t)F * C * 128);
        std::vector<uint8_t> ress((size_t)F * C * 128);
        std::vector<uint8_t> inten((size_t)F * C * 8);
        std::vector<int32_t> nsrc((size_t)F * C * 8 * 128, 0);
        std::vector<uint8_t> nsci((size_t)F * C * 8 * 128, 0);
        std::vector<uint8_t> nmask((size_t)F * C * 8 * 128, 0);
        int rc = cri_hca_unpack_frames(
            frames.data(), F, fs, cipher.data(), C, version,
            hfr_groups, min_res, max_res, ctype.data(), coded.data(),
            ath.data(), invert.data(), real_max_bit, read_bit.data(),
            read_val.data(), &rnd_state,
            qc.data(), sfs.data(), ress.data(), inten.data(),
            nsrc.data(), nsci.data(), nmask.data(), 1 + (int)(rng() % 4));
        if (rc != 0) continue;
        deep++;
        // outputs must stay in the ranges the transform trusts
        for (auto v : sfs) assert(v < 64);
        for (auto v : ress) assert(v < 16);
        for (auto v : inten) assert(v < 16);
        if (need_noise) {
            for (auto v : nsci) assert(v < 128);
            for (auto v : nsrc) assert(v >= 0 && v < 128);
        }
        // feed the decode transform with a random-but-valid HFR map
        std::vector<uint8_t> hfr_is(128, 0);
        std::vector<int32_t> hfr_src(128), hfr_grp(128, 0);
        for (int i = 0; i < 128; i++) hfr_src[i] = i;
        int hfr_zero = base + stereo;
        if (hfr_groups > 0 && hfr_zero < 128) {
            for (int i = hfr_zero; i < total && i < 128; i++) {
                hfr_is[i] = 1;
                hfr_src[i] = hfr_zero - 1 - (i - hfr_zero);
                if (hfr_src[i] < 0) hfr_src[i] = 0;
                hfr_grp[i] = (i - hfr_zero) / bphg;
            }
        }
        std::vector<int32_t> pairs;
        for (int c = 0; c + 1 < C; c++)
            if (ctype[c] == 1 && ctype[c + 1] == 2) {
                pairs.push_back(c);
                pairs.push_back(c + 1);
                c++;
            }
        std::vector<float> scaling(64), range16(16), conv128(128),
            ir16(16), isin(7 * 64), icos(7 * 64), win(128);
        for (int i = 0; i < 64; i++) scaling[i] = 0.01f * (float)i;
        for (int i = 0; i < 16; i++) { range16[i] = 0.5f; ir16[i] = 1.1f; }
        for (int i = 0; i < 128; i++) { conv128[i] = 0.9f; win[i] = 0.7f; }
        for (int i = 0; i < 7 * 64; i++) { isin[i] = 0.3f; icos[i] = 0.6f; }
        std::vector<int16_t> pcm((size_t)F * 8 * 128 * C);
        cri_hca_decode_transform(
            qc.data(), sfs.data(), ress.data(), inten.data(),
            need_noise ? nsrc.data() : nullptr,
            need_noise ? nsci.data() : nullptr,
            need_noise ? nmask.data() : nullptr,
            F, C, base, total, pairs.data(), (int32_t)(pairs.size() / 2),
            need_noise, hfr_groups > 0, hfr_groups,
            hfr_is.data(), hfr_src.data(), hfr_grp.data(), hfr_zero,
            scaling.data(), range16.data(), conv128.data(), ir16.data(),
            isin.data(), icos.data(), win.data(), pcm.data());
    }
    printf("  hca ctypes-boundary fuzz OK (%d deep unpacks)\n", deep);
}

int main() {
    hostile_decompress();
    mp2_unpack_cases();
    mp2_synthesize_cases();
    hca_boundary_fuzz();
    std::mt19937 rng(7);
    std::vector<uint8_t> text;
    for (int i = 0; i < 120; i++)
        for (const char* p = "the quick brown fox jumps over the lazy dog. ";
             *p; p++)
            text.push_back((uint8_t)*p);
    roundtrip(text, "text");

    std::vector<uint8_t> rep(4000);
    for (size_t i = 0; i < rep.size(); i++) rep[i] = (uint8_t)(i % 7);
    roundtrip(rep, "repetitive");

    std::vector<uint8_t> noise(8192);
    for (auto& b : noise) b = (uint8_t)rng();
    roundtrip(noise, "incompressible");

    std::vector<uint8_t> tiny(200, 0x41);
    roundtrip(tiny, "tiny");

    // HCA unpack: synthetic valid frames (sync + zero payload + CRC) run the
    // scalefactor/intensity/spectrum readers and the threading path
    {
        const int fs = 0x100, nframes = 64, channels = 2;
        std::vector<uint8_t> frames(nframes * fs, 0);
        for (int f = 0; f < nframes; f++) {
            uint8_t* p = frames.data() + f * fs;
            p[0] = 0xFF;
            p[1] = 0xFF;
            uint16_t crc = cri_crc16(p, fs - 2);
            p[fs - 2] = (uint8_t)(crc >> 8);
            p[fs - 1] = (uint8_t)crc;
        }
        std::vector<uint8_t> cipher(256);
        for (int i = 0; i < 256; i++) cipher[i] = (uint8_t)i;
        uint8_t channel_type[2] = {1, 2};
        int32_t coded_count[2] = {96, 80};
        std::vector<uint8_t> ath(128, 0), invert(66, 1);
        std::vector<uint8_t> max_bit(16, 0), read_bit(128, 0);
        std::vector<int8_t> read_val(128, 0);
        for (int i = 0; i < 16; i++) max_bit[i] = (uint8_t)((i < 8) ? i / 3 : i - 4);
        uint32_t rnd = 1;
        std::vector<int16_t> qc((size_t)nframes * channels * 8 * 128);
        std::vector<uint8_t> sfs((size_t)nframes * channels * 128);
        std::vector<uint8_t> ress((size_t)nframes * channels * 128);
        std::vector<uint8_t> inten((size_t)nframes * channels * 8);
        std::vector<int32_t> nsrc((size_t)nframes * channels * 8 * 128, 0);
        std::vector<uint8_t> nsci((size_t)nframes * channels * 8 * 128, 0);
        std::vector<uint8_t> nmask((size_t)nframes * channels * 8 * 128, 0);
        int rc = cri_hca_unpack_frames(
            frames.data(), nframes, fs, cipher.data(), channels, 0x0200,
            0, 1, 15, channel_type, coded_count, ath.data(), invert.data(),
            max_bit.data(), read_bit.data(), read_val.data(), &rnd,
            qc.data(), sfs.data(), ress.data(), inten.data(),
            nsrc.data(), nsci.data(), nmask.data(), 8);
        assert(rc == 0);
        printf("  hca unpack (64 zero frames, 8 threads) OK\n");
    }

    // ADX lane scans: encode random PCM, decode it back, both threaded
    {
        const int32_t L = 4, B = 50, spb = 32;
        std::vector<int32_t> pcm((size_t)L * B * spb);
        for (auto& v : pcm) v = (int32_t)(int16_t)rng();
        std::vector<int32_t> c0(L, 0x1CB1), c1(L, -0x0D4C);
        std::vector<int32_t> h1(L, 0), h2(L, 0);
        std::vector<int32_t> codes((size_t)L * B * spb);
        std::vector<int32_t> sraw((size_t)L * B);
        std::vector<uint8_t> zero((size_t)L * B);
        cri_adx_encode_scan(pcm.data(), c0.data(), c1.data(), h1.data(),
                            h2.data(), L, B, spb, 3, 4, codes.data(),
                            sraw.data(), zero.data(), 4, 0);
        // decoder-exact quantiser variant (scale_fix)
        cri_adx_encode_scan(pcm.data(), c0.data(), c1.data(), h1.data(),
                            h2.data(), L, B, spb, 3, 4, codes.data(),
                            sraw.data(), zero.data(), 4, 1);
        const int64_t N = (int64_t)B * spb;
        std::vector<int32_t> scales((size_t)L * N), dc0((size_t)L * N),
            dc1((size_t)L * N);
        for (int32_t l = 0; l < L; ++l)
            for (int64_t t = 0; t < N; ++t) {
                scales[l * N + t] = sraw[l * B + t / spb] + 1;
                dc0[l * N + t] = c0[l];
                dc1[l * N + t] = c1[l];
            }
        std::vector<int16_t> out((size_t)L * N);
        cri_adx_decode_scan(codes.data(), scales.data(), dc0.data(),
                            dc1.data(), h1.data(), h2.data(), L, N,
                            out.data(), 4);
        printf("  adx encode+decode scans (4 lanes, 4 threads) OK\n");
    }

    // HCA encoder/decoder native stages on synthetic data (bounds + UB)
    {
        const int32_t F = 4, C = 2;
        std::vector<int16_t> timeline((size_t)C * F * 1024);
        for (auto& v : timeline) v = (int16_t)rng();
        std::vector<float> win(128), dsin(255), dcos(255);
        for (int i = 0; i < 128; i++) win[i] = 0.5f;
        for (int i = 0; i < 255; i++) { dsin[i] = 0.3f; dcos[i] = 0.7f; }
        std::vector<int32_t> shuffle(128);
        for (int i = 0; i < 128; i++) shuffle[i] = 127 - i;
        std::vector<float> spectra((size_t)F * C * 8 * 128);
        cri_hca_mdct(timeline.data(), C, F, win.data(), dsin.data(),
                     dcos.data(), shuffle.data(), spectra.data());
        std::vector<uint8_t> inten((size_t)F * C * 8, 0);
        uint8_t ctype[2] = {1, 2};
        std::vector<float> bounds(14, 0.6f);
        cri_hca_intensity_stereo(spectra.data(), inten.data(), F, C, 8, 100,
                                 ctype, 1, bounds.data());
        std::vector<int32_t> coded(C, 100);
        std::vector<float> scaling(64), qscaling(64);
        for (int i = 0; i < 64; i++) {
            scaling[i] = (float)i * 0.1f;
            qscaling[i] = 1.0f / (1.0f + i);
        }
        std::vector<int32_t> sf((size_t)F * C * 128);
        std::vector<float> scaled((size_t)F * C * 8 * 128);
        cri_hca_scalefactors_scale(spectra.data(), F, C, coded.data(),
                                   scaling.data(), qscaling.data(),
                                   0.9999999f, sf.data(), scaled.data());
        std::vector<uint8_t> curve(59), mb(16), qb(8 * 16, 2);
        for (int i = 0; i < 59; i++) curve[i] = (uint8_t)(i * 15 / 58);
        for (int i = 0; i < 16; i++) mb[i] = (uint8_t)(i / 2 + 1);
        std::vector<float> dz(16, 0.1f), ssi(16);
        for (int i = 0; i < 16; i++) ssi[i] = (float)(1 << (i / 2));
        std::vector<int32_t> db((size_t)F * C), hl((size_t)F * C);
        cri_hca_delta_lengths(sf.data(), F, C, coded.data(), ctype, 2, 3,
                              db.data(), hl.data());
        std::vector<int32_t> level(F), boundary(F);
        int rc2 = cri_hca_search_levels(
            sf.data(), scaled.data(), db.data(), hl.data(), F, C,
            0x100 * 8, coded.data(), ctype, 2, 3, 8, 100 - 8,
            curve.data(), mb.data(), dz.data(), ssi.data(), qb.data(),
            level.data(), boundary.data(), 2);
        (void)rc2;
        std::vector<int32_t> res((size_t)F * C * 128);
        std::vector<int32_t> quant((size_t)F * C * 8 * 128);
        cri_hca_resolution_quantize(sf.data(), scaled.data(), level.data(),
                                    boundary.data(), F, C, coded.data(),
                                    curve.data(), ssi.data(), res.data(),
                                    quant.data());
        // decode transform on the quantised data
        std::vector<int16_t> qc((size_t)F * C * 8 * 128);
        for (size_t i = 0; i < qc.size(); i++)
            qc[i] = (int16_t)(quant[i] & 0xF);
        std::vector<uint8_t> sfu((size_t)F * C * 128), rsu((size_t)F * C * 128);
        for (size_t i = 0; i < sfu.size(); i++) {
            sfu[i] = (uint8_t)(sf[i] & 63);
            rsu[i] = (uint8_t)(res[i] & 15);
        }
        std::vector<float> range16(16, 0.5f), conv128(128, 0.9f),
            ir16(16, 1.2f), isin(7 * 64, 0.4f), icos(7 * 64, 0.8f);
        std::vector<uint8_t> hfr_is(128, 0);
        std::vector<int32_t> hfr_src(128), hfr_grp(128, 0);
        for (int i = 0; i < 128; i++) hfr_src[i] = i;
        for (int i = 108; i < 120; i++) { hfr_is[i] = 1; hfr_src[i] = i - 100; }
        int32_t prs[2] = {0, 1};
        std::vector<int16_t> pcm((size_t)F * 8 * 128 * C);
        cri_hca_decode_transform(
            qc.data(), sfu.data(), rsu.data(), inten.data(),
            nullptr, nullptr, nullptr, F, C, 8, 100, prs, 1, 0, 1, 8,
            hfr_is.data(), hfr_src.data(), hfr_grp.data(), 119,
            scaling.data(), range16.data(), conv128.data(), ir16.data(),
            isin.data(), icos.data(), win.data(), pcm.data());
        printf("  hca native encode/decode stages OK\n");
    }

    std::vector<uint8_t> rows(64 * 512);
    for (auto& b : rows) b = (uint8_t)rng();
    std::vector<uint16_t> crcs(64);
    cri_crc16_batch(rows.data(), 64, 512, crcs.data());
    printf("  crc16_batch OK (first=0x%04x)\n", crcs[0]);
    printf("sanitize_check: all OK\n");
    return 0;
}
