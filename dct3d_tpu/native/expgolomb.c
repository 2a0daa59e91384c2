/* Streaming signed Exp-Golomb bit codec (host side).
 *
 * TPU-native framework's equivalent of the reference's C entropy codec
 * (reference: 3d-DCT-video-encoding-OpenCL/ExpGolomb.c:5-130) — same bit
 * format, new implementation:
 *   - 64-bit accumulator reader/writer instead of per-bit byte twiddling,
 *   - bulk (array-at-a-time) API so Python crosses the FFI once per GOP,
 *   - explicit bit-position cursors so chunked streaming needs no buffer
 *     compaction dance (decoder.c:210-243 in the reference).
 *
 * The encode path is normally executed on the TPU (ops/bitpack.py); this C
 * encoder is the CPU fallback and test oracle.  The serial decode path is
 * inherently sequential, so it lives here at memory speed.
 *
 * Format (ExpGolombWriter.java:19-49): v>0 -> m=2v-1, v<=0 -> m=-2v;
 * code = m+1 emitted MSB-first in (2*bitlen(code)-1) bits.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#if defined(__GNUC__)
#define EG_EXPORT __attribute__((visibility("default")))
#else
#define EG_EXPORT
#endif

/* ------------------------------------------------------------------ */
/* Encode: append n codewords to `out` starting at bit *bitpos.        */
/* `out` must be zeroed from *bitpos onward; returns 0 on success,     */
/* -1 if out_cap (bytes) would be exceeded.                            */
/* ------------------------------------------------------------------ */
EG_EXPORT int eg_encode(const int32_t *values, size_t n, uint8_t *out,
                        size_t out_cap, uint64_t *bitpos) {
    uint64_t pos = *bitpos;
    for (size_t i = 0; i < n; i++) {
        int64_t v = values[i];
        uint64_t m = v > 0 ? (uint64_t)(2 * v - 1) : (uint64_t)(-2 * v);
        uint64_t code = m + 1;
        int nbits = 64 - __builtin_clzll(code);
        int width = 2 * nbits - 1;
        uint64_t end = pos + (uint64_t)width;
        if ((end + 7) / 8 > out_cap) return -1;
        /* write `code` MSB-first into bits [pos, end) */
        uint64_t bit = pos;
        int remaining = width;
        while (remaining > 0) {
            size_t byte = (size_t)(bit >> 3);
            int avail = 8 - (int)(bit & 7);
            int take = remaining < avail ? remaining : avail;
            uint64_t chunk = (code >> (remaining - take)) & ((1u << take) - 1u);
            out[byte] |= (uint8_t)(chunk << (avail - take));
            bit += (uint64_t)take;
            remaining -= take;
        }
        pos = end;
    }
    *bitpos = pos;
    return 0;
}

/* ------------------------------------------------------------------ */
/* 12-bit window batch tables: one lookup decodes/skips EVERY complete */
/* codeword in the next 12 stream bits (typical streams run 1-2.5      */
/* bits/codeword, so ~5-8 codewords per hit vs one clz round each).    */
/* The decode table stops early at values outside the int4 plane range */
/* [-8, 7] (they ride the exception list via the scalar path) and at   */
/* codewords that don't fit the window; count==0 means "scalar one".   */
/* ------------------------------------------------------------------ */
typedef struct {
    uint64_t nibbles; /* value j of the window at bits [4j, 4j+4) */
    uint8_t count;    /* complete in-range codewords (<= 12) */
    uint8_t bits;     /* stream bits they consume (<= 12) */
    uint8_t pad[6];
} EgTab;

static EgTab g_tab[4096];
static uint8_t g_scan_bits[4096], g_scan_cnt[4096];

__attribute__((constructor)) static void eg_build_tables(void) {
    for (int key = 0; key < 4096; key++) {
        /* bit j of the window (MSB-first) = (key >> (11-j)) & 1 */
        int pos = 0, k = 0;
        uint64_t nib = 0;
        while (pos < 12 && k < 12) {
            int z = 0;
            while (pos + z < 12 && !((key >> (11 - (pos + z))) & 1)) z++;
            if (pos + z >= 12 || pos + 2 * z + 1 > 12) break;
            uint32_t code = 0;
            for (int b = 0; b <= z; b++)
                code = (code << 1) | ((key >> (11 - (pos + z + b))) & 1u);
            uint32_t m = code - 1;
            int v = (m & 1) ? (int)((m + 1) >> 1) : -(int)(m >> 1);
            if (v < -8 || v > 7) break;
            nib |= ((uint64_t)(v & 0xF)) << (4 * k);
            k++;
            pos += 2 * z + 1;
        }
        g_tab[key].nibbles = nib;
        g_tab[key].count = (uint8_t)k;
        g_tab[key].bits = (uint8_t)pos;
        /* scan variant: same walk without the value restriction */
        int spos = 0, sk = 0;
        while (spos < 12) {
            int z = 0;
            while (spos + z < 12 && !((key >> (11 - (spos + z))) & 1)) z++;
            if (spos + z >= 12 || spos + 2 * z + 1 > 12) break;
            sk++;
            spos += 2 * z + 1;
        }
        g_scan_bits[key] = (uint8_t)spos;
        g_scan_cnt[key] = (uint8_t)sk;
    }
}

/* Big-endian 64-bit window load (for the fast decode path). */
static inline uint64_t load_be64(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8);
#if defined(__GNUC__)
    return __builtin_bswap64(v);
#else
    return ((v & 0xFFull) << 56) | ((v & 0xFF00ull) << 40) |
           ((v & 0xFF0000ull) << 24) | ((v & 0xFF000000ull) << 8) |
           ((v >> 8) & 0xFF000000ull) | ((v >> 24) & 0xFF0000ull) |
           ((v >> 40) & 0xFF00ull) | (v >> 56);
#endif
}

/* Fast path: decode one codeword from a 64-bit window when it fits
 * entirely (width <= 57-phase guaranteed by lz bound check).  Returns the
 * signed value and advances *pos; returns 0/1 via *ok. */
static inline int64_t decode_fast(const uint8_t *data, size_t cap_bytes,
                                  uint64_t nbits_avail, uint64_t *pos,
                                  int *ok) {
    uint64_t p = *pos;
    size_t byte = (size_t)(p >> 3);
    int phase = (int)(p & 7);
    if (byte + 8 > cap_bytes) { *ok = 0; return 0; }
    uint64_t w = load_be64(data + byte) << phase;
    if (w == 0) { *ok = 0; return 0; } /* long zero run: slow path */
    int lz = __builtin_clzll(w);
    int width = 2 * lz + 1;
    if (width > 64 - phase || p + (uint64_t)width > nbits_avail) {
        *ok = 0;
        return 0;
    }
    uint64_t code = w >> (64 - width);
    *pos = p + (uint64_t)width;
    uint64_t m = code - 1;
    *ok = 1;
    return (m & 1) ? (int64_t)((m + 1) >> 1) : -(int64_t)(m >> 1);
}

/* ------------------------------------------------------------------ */
/* Decode: read n values starting at bit *bitpos.  nbits_avail is the  */
/* number of valid bits in `data`.  Returns 0 on success, -1 if the    */
/* stream ran out mid-codeword (bitpos is then left unchanged).        */
/* ------------------------------------------------------------------ */
EG_EXPORT int eg_decode(const uint8_t *data, uint64_t nbits_avail,
                        uint64_t *bitpos, int32_t *out, size_t n) {
    uint64_t pos = *bitpos;
    uint64_t start = pos;
    size_t cap_bytes = (size_t)((nbits_avail + 7) / 8);
    for (size_t i = 0; i < n; i++) {
        /* batch fast path: decode every complete in-nibble codeword of
         * the next 12 bits per table hit (same table as planar4).  Whole
         * bytes only (nbits_avail >> 3), so a trailing partial byte's
         * padding bits can never be consumed as codewords. */
        while (i + 12 <= n) {
            size_t byte = (size_t)(pos >> 3);
            if (byte + 8 > (size_t)(nbits_avail >> 3)) break;
            uint64_t w = load_be64(data + byte) << (pos & 7);
            int avail = 64 - (int)(pos & 7);
            int used = 0;
            while (used + 12 <= avail && i + 12 <= n) {
                EgTab e = g_tab[(w << used) >> 52];
                if (!e.count) break;
                uint64_t nib = e.nibbles;
                for (int j = 0; j < e.count; j++)
                    out[i + j] =
                        (int32_t)(((int)((nib >> (4 * j)) & 0xF) ^ 8) - 8);
                used += e.bits;
                i += e.count;
            }
            if (!used) break;
            pos += (uint64_t)used;
        }
        if (i >= n) break;
        int ok;
        int64_t v = decode_fast(data, cap_bytes, nbits_avail, &pos, &ok);
        if (ok) {
            out[i] = (int32_t)v;
            continue;
        }
        /* count leading zeros */
        int zeros = 0;
        uint64_t p = pos;
        while (1) {
            if (p >= nbits_avail) { *bitpos = start; return -1; }
            uint8_t byte = data[p >> 3];
            int off = (int)(p & 7);
            uint8_t rest = (uint8_t)(byte << off); /* stream bits at top */
            if (rest != 0) {
                int lz = __builtin_clz((uint32_t)rest) - 24;
                int in_byte = 8 - off;
                if (lz < in_byte) { zeros += lz; p += (uint64_t)lz; break; }
            }
            zeros += 8 - off;
            p += (uint64_t)(8 - off);
        }
        int nbits = zeros + 1;
        if (p + (uint64_t)nbits > nbits_avail) { *bitpos = start; return -1; }
        /* read nbits bits MSB-first starting at p */
        uint64_t code = 0;
        int remaining = nbits;
        while (remaining > 0) {
            uint8_t byte = data[p >> 3];
            int off = (int)(p & 7);
            int avail = 8 - off;
            int take = remaining < avail ? remaining : avail;
            uint64_t chunk = ((uint64_t)byte >> (avail - take)) &
                             ((1u << take) - 1u);
            code = (code << take) | chunk;
            p += (uint64_t)take;
            remaining -= take;
        }
        pos = p;
        uint64_t m = code - 1;
        out[i] = (m & 1) ? (int32_t)((m + 1) >> 1) : -(int32_t)(m >> 1);
    }
    *bitpos = pos;
    return 0;
}

/* ------------------------------------------------------------------ */
/* Fused decode + planarize: decode n values directly into an int8     */
/* plane (wrapping cast) plus an exception list (flat index, true      */
/* value) for values outside int8 — the device-upload format of the    */
/* decoder (codec/decoder.py).  One pass, no int32 intermediate.       */
/* Returns 0 ok, -1 stream exhausted (bitpos unchanged), -2 exception  */
/* capacity exceeded (bitpos unchanged).                               */
/* ------------------------------------------------------------------ */
EG_EXPORT int eg_decode_planar(const uint8_t *data, uint64_t nbits_avail,
                               uint64_t *bitpos, int8_t *plane, size_t n,
                               int32_t *exc_idx, int32_t *exc_val,
                               size_t exc_cap, uint64_t *exc_count) {
    uint64_t pos = *bitpos;
    uint64_t start = pos;
    size_t cap_bytes = (size_t)(nbits_avail >> 3); /* whole bytes only */
    size_t nexc = 0;
    size_t i = 0;
    while (i < n) {
        /* fast path: batch-decode the 12-bit window's complete in-nibble
         * codewords per table hit (values in [-8,7] are also in int8, so
         * they never hit the exception list), then drain wider-but-int8
         * codewords with the per-codeword clz loop */
        size_t byte = (size_t)(pos >> 3);
        if (byte + 8 <= cap_bytes) {
            uint64_t w = load_be64(data + byte) << (pos & 7);
            int avail = 64 - (int)(pos & 7);
            int used = 0;
            while (used + 12 <= avail && i + 12 <= n) {
                EgTab e = g_tab[(w << used) >> 52];
                if (!e.count) break;
                uint64_t nib = e.nibbles;
                for (int j = 0; j < e.count; j++)
                    plane[i + j] =
                        (int8_t)(((int)((nib >> (4 * j)) & 0xF) ^ 8) - 8);
                used += e.bits;
                i += e.count;
            }
            while (i < n) {
                uint64_t ww = w << used;
                if (ww == 0) break;
                int lz = __builtin_clzll(ww);
                int width = 2 * lz + 1;
                if (used + width > avail) break;
                uint64_t code = ww >> (64 - width);
                used += width;
                uint64_t m = code - 1;
                int64_t v = (m & 1) ? (int64_t)((m + 1) >> 1)
                                    : -(int64_t)(m >> 1);
                plane[i] = (int8_t)v;
                if ((int64_t)(int8_t)v != v) {
                    if (nexc >= exc_cap) { *bitpos = start; return -2; }
                    exc_idx[nexc] = (int32_t)i;
                    exc_val[nexc] = (int32_t)v;
                    nexc++;
                }
                i++;
            }
            if (used > 0) {
                pos += (uint64_t)used;
                continue;
            }
        }
        /* slow path shared with eg_decode */
        int32_t one;
        uint64_t p2 = pos;
        if (eg_decode(data, nbits_avail, &p2, &one, 1) != 0) {
            *bitpos = start;
            return -1;
        }
        pos = p2;
        plane[i] = (int8_t)one;
        if ((int64_t)(int8_t)one != (int64_t)one) {
            if (nexc >= exc_cap) { *bitpos = start; return -2; }
            exc_idx[nexc] = (int32_t)i;
            exc_val[nexc] = (int32_t)one;
            nexc++;
        }
        i++;
    }
    *bitpos = pos;
    *exc_count = nexc;
    return 0;
}

/* ------------------------------------------------------------------ */
/* Fused decode + 4-bit planarize: like eg_decode_planar but the plane */
/* packs two values per byte (low nibble = even index), halving the    */
/* host->device upload.  Values outside [-8, 7] go to the exception    */
/* list.  n must be even.                                              */
/* ------------------------------------------------------------------ */
EG_EXPORT int eg_decode_planar4(const uint8_t *data, uint64_t nbits_avail,
                                uint64_t *bitpos, uint8_t *plane, size_t n,
                                int32_t *exc_idx, int32_t *exc_val,
                                size_t exc_cap, uint64_t *exc_count) {
    uint64_t pos = *bitpos;
    uint64_t start = pos;
    size_t cap_bytes = (size_t)(nbits_avail >> 3); /* whole bytes only */
    size_t nexc = 0;
    size_t i = 0;
    while (i < n) {
        /* fast path: one 12-bit table hit per ~5-8 codewords.  Each hit
         * merges up to 12 nibbles with ONE unaligned 8-byte store
         * (little-endian hosts; nibble j of the entry lands at plane
         * nibble i+j).  The store's zeroed tail bytes are plane bytes of
         * values not yet decoded, which later iterations (re)write — and
         * the i + 16 <= n guard keeps it inside plane[n/2]. */
#if !defined(__BYTE_ORDER__) || __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
        /* the uint64 nibble store below lays entry nibble j at plane
         * nibble i+j only on little-endian hosts; big-endian builds take
         * the (endian-safe) scalar path instead */
        size_t byte = (size_t)(pos >> 3);
        if (byte + 8 <= cap_bytes && i + 16 <= n) {
            uint64_t w = load_be64(data + byte) << (pos & 7);
            int avail = 64 - (int)(pos & 7);
            int used = 0;
            while (used + 12 <= avail && i + 16 <= n) {
                EgTab e = g_tab[(w << used) >> 52];
                if (!e.count) break;
                size_t o = i >> 1;
                int par = (int)(i & 1);
                uint64_t v = e.nibbles << (4 * par);
                if (par) v |= (uint64_t)(plane[o] & 0x0F);
                memcpy(plane + o, &v, 8);
                used += e.bits;
                i += e.count;
            }
            if (used > 0) {
                pos += (uint64_t)used;
                continue;
            }
        }
#endif
        /* scalar: window tail, long zero run, out-of-nibble value
         * (-> exception list), or the last <16 values */
        int32_t one;
        uint64_t p2 = pos;
        if (eg_decode(data, nbits_avail, &p2, &one, 1) != 0) {
            *bitpos = start;
            return -1;
        }
        pos = p2;
        uint8_t nib = (uint8_t)(one & 0xF);
        if (i & 1)
            plane[i >> 1] |= (uint8_t)(nib << 4);
        else
            plane[i >> 1] = nib;
        if (one < -8 || one > 7) {
            if (nexc >= exc_cap) { *bitpos = start; return -2; }
            exc_idx[nexc] = (int32_t)i;
            exc_val[nexc] = (int32_t)one;
            nexc++;
        }
        i++;
    }
    *bitpos = pos;
    *exc_count = nexc;
    return 0;
}

/* Scan without materializing values: returns the bit position after
 * skipping n codewords, or UINT64_MAX if the stream ran out.  Used by the
 * parallel decoder to find GOP bit boundaries cheaply (codec/decoder.py).
 *
 * Fast path drains MANY codewords per 64-bit window load (typical widths
 * are 1-3 bits, so ~20 codewords per load) instead of reloading per
 * codeword — ~5x the naive per-codeword scan. */
EG_EXPORT uint64_t eg_scan(const uint8_t *data, uint64_t nbits_avail,
                           uint64_t bitpos, size_t n) {
    uint64_t pos = bitpos;
    size_t i = 0;
    size_t cap_bytes = (size_t)(nbits_avail >> 3); /* whole bytes only */
    while (i < n) {
        size_t byte = (size_t)(pos >> 3);
        if (byte + 8 <= cap_bytes) {
            uint64_t w = load_be64(data + byte) << (pos & 7);
            int avail = 64 - (int)(pos & 7);
            int used = 0;
            /* 12-bit table hits skip ~5-8 codewords each; per-codeword clz
             * only for the window tail / the last <12 values. */
            while (used + 12 <= avail) {
                unsigned key = (unsigned)((w << used) >> 52);
                unsigned cnt = g_scan_cnt[key];
                if (!cnt || i + cnt > n) break;
                used += g_scan_bits[key];
                i += cnt;
            }
            while (i < n) {
                uint64_t ww = w << used;
                if (ww == 0) break; /* zero run continues past the window */
                int lz = __builtin_clzll(ww);
                int width = 2 * lz + 1;
                if (used + width > avail) break;
                used += width;
                i++;
            }
            if (used > 0) {
                pos += (uint64_t)used;
                continue;
            }
        }
        /* slow path: one codeword bit by bit (window tail / long zero run) */
        int zeros = 0;
        while (1) {
            if (pos >= nbits_avail) return UINT64_MAX;
            uint8_t b = data[pos >> 3];
            int off = (int)(pos & 7);
            uint8_t rest = (uint8_t)(b << off);
            if (rest != 0) {
                int lz = __builtin_clz((uint32_t)rest) - 24;
                int in_byte = 8 - off;
                if (lz < in_byte) { zeros += lz; pos += (uint64_t)lz; break; }
            }
            zeros += 8 - off;
            pos += (uint64_t)(8 - off);
        }
        pos += (uint64_t)(zeros + 1);
        if (pos > nbits_avail) return UINT64_MAX;
        i++;
    }
    return pos;
}

/* ------------------------------------------------------------------ */
/* PNG scanline unfiltering (spec 4.5.2): sequential per pixel, so it */
/* lives here at memory speed (io/png.py's reader calls it; the       */
/* Python fallback is only for hosts without a compiler).             */
/* raw: h*(stride+1) filtered bytes; out: h*stride.  Returns 0, or    */
/* -1 on an invalid filter type.                                      */
/* ------------------------------------------------------------------ */
EG_EXPORT int png_unfilter(const uint8_t *raw, size_t h, size_t stride,
                           int bpp, uint8_t *out) {
    const uint8_t *prev = NULL;
    for (size_t y = 0; y < h; y++) {
        uint8_t ftype = raw[y * (stride + 1)];
        const uint8_t *line = raw + y * (stride + 1) + 1;
        uint8_t *cur = out + y * stride;
        switch (ftype) {
        case 0:
            memcpy(cur, line, stride);
            break;
        case 1: /* Sub */
            for (size_t x = 0; x < stride; x++) {
                uint8_t a = x >= (size_t)bpp ? cur[x - bpp] : 0;
                cur[x] = (uint8_t)(line[x] + a);
            }
            break;
        case 2: /* Up */
            for (size_t x = 0; x < stride; x++)
                cur[x] = (uint8_t)(line[x] + (prev ? prev[x] : 0));
            break;
        case 3: /* Average */
            for (size_t x = 0; x < stride; x++) {
                int a = x >= (size_t)bpp ? cur[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                cur[x] = (uint8_t)(line[x] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (size_t x = 0; x < stride; x++) {
                int a = x >= (size_t)bpp ? cur[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= (size_t)bpp) ? prev[x - bpp] : 0;
                int p = a + b - c;
                int pa = p > a ? p - a : a - p;
                int pb = p > b ? p - b : b - p;
                int pc = p > c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                cur[x] = (uint8_t)(line[x] + pred);
            }
            break;
        default:
            return -1;
        }
        prev = cur;
    }
    return 0;
}

/* Cache-blocked byte-matrix transpose: out[c * rows + r] = in[r * cols + c].
 * The turbo wire stores the coefficient-pair-major TRANSPOSE of the device
 * transport's (cubes, cube/2) nibble plane (codec/turbo.py); numpy's strided
 * transpose copy runs ~3 ns/byte on the 1080p plane, the blocked form well
 * under 1. ctypes releases the GIL for the call, so the per-member drain
 * pool overlaps transposes across cores. */
void byte_transpose(const uint8_t *in, size_t rows, size_t cols,
                    uint8_t *out) {
    const size_t B = 128;
    for (size_t r0 = 0; r0 < rows; r0 += B) {
        size_t r1 = r0 + B < rows ? r0 + B : rows;
        for (size_t c0 = 0; c0 < cols; c0 += B) {
            size_t c1 = c0 + B < cols ? c0 + B : cols;
            for (size_t c = c0; c < c1; ++c) {
                uint8_t *o = out + c * rows + r0;
                const uint8_t *i = in + r0 * cols + c;
                for (size_t r = r0; r < r1; ++r, i += cols)
                    *o++ = *i;
            }
        }
    }
}
