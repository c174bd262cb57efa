/* Row-delta coding of uint8 image planes (threaded).
 *
 * The tunneled TPU transport compresses its byte stream; photographic rows
 * delta-code to near-zero values that compress several times smaller, so the
 * host<->device copy of raw images/canvases rides the wire much faster
 * (openpano_tpu/io/transfer.py).  This native version replaces the numpy
 * int16 round-trip (2x materialization of the buffer) with one streaming
 * pass per row, parallelized over rows with pthreads.
 *
 * Reference analog: none (the reference is single-process, no transport);
 * this is part of the TPU runtime's native IO layer, playing the role the
 * reference's native CImg/lodepng IO layer plays (lib/imgio.cc:25-113).
 */

#include <pthread.h>
#include <stddef.h>
#include <stdint.h>

typedef struct {
    const uint8_t *src;
    uint8_t *dst;
    int64_t rows, cols;
    int64_t row0, row1;
    int decode;
} delta_job;

static void *delta_worker(void *arg)
{
    delta_job *j = (delta_job *)arg;
    for (int64_t r = j->row0; r < j->row1; ++r) {
        const uint8_t *s = j->src + r * j->cols;
        uint8_t *d = j->dst + r * j->cols;
        if (j->decode) {
            /* prefix-sum mod 256 */
            uint8_t acc = 0;
            for (int64_t c = 0; c < j->cols; ++c) {
                acc = (uint8_t)(acc + s[c]);
                d[c] = acc;
            }
        } else {
            uint8_t prev = 0;
            for (int64_t c = 0; c < j->cols; ++c) {
                uint8_t v = s[c];
                d[c] = (uint8_t)(v - prev);
                prev = v;
            }
        }
    }
    return 0;
}

static void run_delta(const uint8_t *src, uint8_t *dst, int64_t rows,
                      int64_t cols, int nthreads, int decode)
{
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    if (nthreads > rows) nthreads = (int)(rows > 0 ? rows : 1);
    pthread_t tids[16];
    delta_job jobs[16];
    int64_t chunk = (rows + nthreads - 1) / nthreads;
    int launched = 0;
    for (int t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < rows ? r0 + chunk : rows;
        if (r0 >= r1) break;
        jobs[t].src = src;
        jobs[t].dst = dst;
        jobs[t].rows = rows;
        jobs[t].cols = cols;
        jobs[t].row0 = r0;
        jobs[t].row1 = r1;
        jobs[t].decode = decode;
        if (t == nthreads - 1 || r1 >= rows) {
            delta_worker(&jobs[t]);
            break;
        }
        if (pthread_create(&tids[t], 0, delta_worker, &jobs[t]) != 0) {
            delta_worker(&jobs[t]); /* fall back to inline on failure */
            break;
        }
        launched++;
    }
    for (int t = 0; t < launched; ++t) pthread_join(tids[t], 0);
}

/* dst[r, 0] = src[r, 0]; dst[r, c] = src[r, c] - src[r, c-1] (mod 256) */
void delta_encode_rows(const uint8_t *src, uint8_t *dst, int64_t rows,
                       int64_t cols, int nthreads)
{
    run_delta(src, dst, rows, cols, nthreads, 0);
}

/* inverse: dst[r, c] = sum(src[r, 0..c]) mod 256 */
void delta_decode_rows(const uint8_t *src, uint8_t *dst, int64_t rows,
                       int64_t cols, int nthreads)
{
    run_delta(src, dst, rows, cols, nthreads, 1);
}
