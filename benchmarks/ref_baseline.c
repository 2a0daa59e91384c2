/* Reference-algorithm CPU baseline for bench.py.
 *
 * From-scratch C implementation of the reference codec's *algorithm* at its
 * published operating point, used only to measure a baseline frames/s on this
 * host (the reference's own Java/OpenCL builds cannot run here):
 *
 *   - brute-force O(N^2)-per-cube 3D DCT, one task per 8x8x8 cube fanned out
 *     over all cores (the Java Transform thread-pool structure,
 *     Transform.java:63-104; math of 3dDCT.cl:43-143, double precision like
 *     the Java path),
 *   - quantization round(c / max(1, 5*(i+j+k)))            (Encoder.java:82),
 *   - diagonal-slice (zigzag) order                        (CubeUtils.java:7-41),
 *   - serial signed Exp-Golomb bit writer                  (ExpGolombWriter.java:19-49),
 *   - one-shot zlib deflate, Z_BEST_COMPRESSION            (encoder.c:139).
 *
 * This is a *favorable* stand-in for the Java encoder (C, -O3, no JVM), so
 * the speedup bench.py reports against it understates the true ratio.
 *
 * Usage: ref_baseline <width> <height> <frames> <threads>
 * Output: one JSON line {"sec_per_frame": S, "bytes": N}
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <zlib.h>

#define B 8
#define CUBE (B * B * B)

static double cos_tab[B][B]; /* cos(pi*(n+0.5)*k/B) */

static void init_tables(void) {
    for (int k = 0; k < B; k++)
        for (int n = 0; n < B; n++)
            cos_tab[k][n] = cos(M_PI * (n + 0.5) * k / B);
}

/* ---- brute-force forward 3D DCT of one cube (O(N^2) like 3dDCT.cl) ---- */
static void dct_cube(const double *in, double *out) {
    const double scale = sqrt(8.0 / CUBE); /* DIMENSIONAL_FACTOR / sqrt(cube) */
    const double inv_sqrt2 = 1.0 / sqrt(2.0);
    for (int kz = 0; kz < B; kz++)
        for (int ky = 0; ky < B; ky++)
            for (int kx = 0; kx < B; kx++) {
                double acc = 0.0;
                for (int z = 0; z < B; z++)
                    for (int y = 0; y < B; y++) {
                        double cy = cos_tab[kz][z] * cos_tab[ky][y];
                        const double *row = in + (z * B + y) * B;
                        for (int x = 0; x < B; x++)
                            acc += row[x] * cy * cos_tab[kx][x];
                    }
                double f = scale;
                if (kx == 0) f *= inv_sqrt2;
                if (ky == 0) f *= inv_sqrt2;
                if (kz == 0) f *= inv_sqrt2;
                out[(kz * B + ky) * B + kx] = acc * f;
            }
}

/* ---- thread-pool fan-out, one task per cube ---- */
typedef struct {
    const unsigned char *frames;
    int32_t *quant;   /* cube-major, zigzag-ordered output */
    const int *zigzag; /* CUBE flat indices */
    const int *qdiv;   /* CUBE divisors in cube layout */
    int w, h, ncubes_x, ncubes_y, ngops;
    int tid, nthreads;
} job_t;

static void *worker(void *arg) {
    job_t *j = (job_t *)arg;
    int total = j->ngops * j->ncubes_y * j->ncubes_x;
    double in[CUBE], out[CUBE];
    for (int c = j->tid; c < total; c += j->nthreads) {
        int g = c / (j->ncubes_y * j->ncubes_x);
        int by = (c / j->ncubes_x) % j->ncubes_y;
        int bx = c % j->ncubes_x;
        /* frame-major -> cube gather (readCubes, encoder.c:10-45) */
        for (int z = 0; z < B; z++)
            for (int y = 0; y < B; y++)
                for (int x = 0; x < B; x++)
                    in[(z * B + y) * B + x] =
                        j->frames[((size_t)(g * B + z) * j->h + by * B + y) * j->w +
                                  bx * B + x];
        dct_cube(in, out);
        int32_t *q = j->quant + (size_t)c * CUBE;
        for (int i = 0; i < CUBE; i++) {
            double v = out[j->zigzag[i]] / j->qdiv[j->zigzag[i]];
            q[i] = (int32_t)(v >= 0 ? floor(v + 0.5) : ceil(v - 0.5));
        }
    }
    return NULL;
}

/* ---- serial Exp-Golomb writer (bit layout of ExpGolombWriter.java) ---- */
typedef struct {
    unsigned char *buf;
    size_t bytepos;
    int bitpos; /* bits used in current byte, 0..7 */
} egw_t;

static void eg_write(egw_t *w, int32_t value) {
    uint64_t m = value > 0 ? 2ull * (uint32_t)value - 1 : 2ull * (uint32_t)(-value);
    uint64_t code = m + 1;
    int nbits = 64 - __builtin_clzll(code);
    int width = 2 * nbits - 1;
    for (int i = width - 1; i >= 0; i--) {
        int bit = (int)((code >> i) & 1u);
        w->buf[w->bytepos] |= (unsigned char)(bit << (7 - w->bitpos));
        if (++w->bitpos == 8) {
            w->bitpos = 0;
            w->bytepos++;
        }
    }
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s <w> <h> <frames> <threads>\n", argv[0]);
        return 2;
    }
    int w = atoi(argv[1]), h = atoi(argv[2]);
    int frames = atoi(argv[3]), nthreads = atoi(argv[4]);
    if (w % B || h % B || frames % B) {
        fprintf(stderr, "geometry must be multiples of 8\n");
        return 2;
    }
    init_tables();

    /* zigzag: positions grouped by x+y+z plane, y outer / z mid / x inner
     * (CubeUtils.java:15-36) */
    int zigzag[CUBE], zi = 0;
    for (int s = 0; s <= 3 * (B - 1); s++)
        for (int y = 0; y < B; y++)
            for (int z = 0; z < B; z++)
                for (int x = 0; x < B; x++)
                    if (x + y + z == s) zigzag[zi++] = (z * B + y) * B + x;
    int qdiv[CUBE];
    for (int z = 0; z < B; z++)
        for (int y = 0; y < B; y++)
            for (int x = 0; x < B; x++) {
                int d = 5 * (x + y + z);
                qdiv[(z * B + y) * B + x] = d < 1 ? 1 : d;
            }

    size_t npix = (size_t)w * h * frames;
    unsigned char *video = malloc(npix);
    unsigned int seed = 12345;
    for (size_t i = 0; i < npix; i++) { /* synthetic gradient + noise */
        seed = seed * 1664525u + 1013904223u;
        size_t x = i % w, y = (i / w) % h;
        video[i] = (unsigned char)(((x + y + i / ((size_t)w * h)) & 0xFF) ^
                                   (seed >> 28));
    }

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);

    int32_t *quant = malloc(npix * sizeof(int32_t));
    job_t jobs[64];
    pthread_t tids[64];
    if (nthreads > 64) nthreads = 64;
    for (int t = 0; t < nthreads; t++) {
        jobs[t] = (job_t){video, quant, zigzag,  qdiv,
                          w,     h,     w / B,   h / B,
                          frames / B,   t,       nthreads};
        pthread_create(&tids[t], NULL, worker, &jobs[t]);
    }
    for (int t = 0; t < nthreads; t++) pthread_join(tids[t], NULL);

    egw_t eg = {calloc(npix * 8 + 16, 1), 0, 0};
    for (size_t i = 0; i < npix; i++) eg_write(&eg, quant[i]);
    size_t coded = eg.bytepos + 1; /* +1 final partial byte (encoder.c:270) */

    uLongf zcap = compressBound(coded);
    unsigned char *zout = malloc(zcap);
    compress2(zout, &zcap, eg.buf, coded, Z_BEST_COMPRESSION);

    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    printf("{\"sec_per_frame\": %.6f, \"bytes\": %lu}\n", dt / frames,
           (unsigned long)zcap);
    return 0;
}
