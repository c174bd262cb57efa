/* 4-bit nibble-delta wire codec for uint8 image planes (threaded).
 *
 * The tunneled TPU transport moves host->device bytes at a fixed ~55 MB/s
 * regardless of element type (measured r4: int32 bitcast and chunked puts
 * change nothing; content entropy moves it only ~2x).  The only lever is
 * sending FEWER BYTES, so this codec halves the payload losslessly:
 *
 *   - rows are per-channel planes; each element is predicted by its left
 *     neighbor (delta mod 256);
 *   - deltas in [-8, 7] (96%+ of photographic content) pack two-per-byte:
 *     row r's nibble in the LOW half, row r + ceil(R/2)'s in the HIGH half
 *     (far-row pairing keeps the device-side unpack a plain concatenate --
 *     a [*, 2] interleave would tile-pad 64x on TPU);
 *   - out-of-range deltas are emitted as (absolute index, true delta byte)
 *     exception pairs, scatter-applied on device before the undelta cumsum.
 *
 * The decoder is pure XLA (openpano_tpu/io/wirecodec.py): unpack nibbles,
 * scatter exceptions, cumsum mod 256 along rows.
 *
 * Reference analog: none (the reference is single-process, its images come
 * from local disk via CImg/libjpeg, lib/imgio.cc:25-57).  This plays the
 * role that fast image IO plays there: getting pixels to the compute
 * engine at full speed.
 */

#include <pthread.h>
#include <stddef.h>
#include <stdint.h>

typedef struct {
    const uint8_t *src;   /* [rows, cols] plane */
    uint8_t *packed;      /* [(rows+1)/2, cols] */
    int64_t *exc_idx;     /* per-thread slice, absolute flat indices */
    uint8_t *exc_val;
    int64_t exc_cap;      /* capacity of this thread's slice */
    int64_t exc_n;        /* written count (output) */
    int64_t rows, cols, half;
    int64_t row0, row1;   /* LOW-nibble row range handled by this thread */
    int overflow;         /* set when exceptions exceeded capacity */
} pack_job;

/* Encode one row: write nibbles for (low_row, high_row) pairs into packed,
 * appending exceptions.  Returns 0 on exception overflow. */
static void pack_rows(pack_job *j)
{
    const int64_t cols = j->cols, half = j->half, rows = j->rows;
    int64_t n = 0;
    for (int64_t r = j->row0; r < j->row1; ++r) {
        /* the two rows sharing packed row r */
        int64_t rlo = r, rhi = r + half;
        const uint8_t *slo = j->src + rlo * cols;
        const uint8_t *shi = rhi < rows ? j->src + rhi * cols : 0;
        uint8_t *p = j->packed + r * cols;
        uint8_t prev_lo = 0, prev_hi = 0;
        for (int64_t c = 0; c < cols; ++c) {
            uint8_t vlo = slo[c];
            uint8_t dlo = (uint8_t)(vlo - prev_lo);
            prev_lo = vlo;
            uint8_t nlo = (uint8_t)(dlo + 8);
            if (nlo > 15) {
                if (n >= j->exc_cap) { j->overflow = 1; j->exc_n = n; return; }
                j->exc_idx[n] = rlo * cols + c;
                j->exc_val[n] = dlo;
                n++;
                nlo = 8; /* delta 0 placeholder; exception overwrites */
            }
            uint8_t nhi = 8;
            if (shi) {
                uint8_t vhi = shi[c];
                uint8_t dhi = (uint8_t)(vhi - prev_hi);
                prev_hi = vhi;
                nhi = (uint8_t)(dhi + 8);
                if (nhi > 15) {
                    if (n >= j->exc_cap) { j->overflow = 1; j->exc_n = n; return; }
                    j->exc_idx[n] = rhi * cols + c;
                    j->exc_val[n] = dhi;
                    n++;
                    nhi = 8;
                }
            }
            p[c] = (uint8_t)(nlo | (nhi << 4));
        }
    }
    j->exc_n = n;
}

static void *pack_worker(void *arg)
{
    pack_rows((pack_job *)arg);
    return 0;
}

/* Pack a [rows, cols] u8 plane.  packed: [(rows+1)/2, cols].  exc_idx/
 * exc_val: caller-allocated, capacity exc_cap TOTAL (split evenly across
 * threads).  Returns the number of exceptions written (compacted to the
 * front of exc_idx/exc_val, globally sorted by index*), or -1 if any
 * thread overflowed its slice (caller should fall back to a raw upload).
 *
 * *Sorted because threads own disjoint low-row ranges but exceptions from
 * hi rows interleave: we re-sort on the host side in numpy (cheap, the
 * exception stream is ~1-4% of elements).  The device decoder does not
 * require sorted indices (scatter), but gap-coding them does.
 */
int64_t wire_pack4(const uint8_t *src, uint8_t *packed, int64_t rows,
                   int64_t cols, int64_t *exc_idx, uint8_t *exc_val,
                   int64_t exc_cap, int nthreads)
{
    int64_t half = (rows + 1) / 2;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    if (nthreads > half) nthreads = (int)(half > 0 ? half : 1);
    pthread_t tids[16];
    pack_job jobs[16];
    int64_t chunk = (half + nthreads - 1) / nthreads;
    int64_t cap_per = exc_cap / nthreads;
    int launched = 0;
    int nj = 0;
    for (int t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < half ? r0 + chunk : half;
        if (r0 >= r1) break;
        pack_job *j = &jobs[nj];
        j->src = src;
        j->packed = packed;
        j->exc_idx = exc_idx + (int64_t)t * cap_per;
        j->exc_val = exc_val + (int64_t)t * cap_per;
        j->exc_cap = cap_per;
        j->exc_n = 0;
        j->rows = rows;
        j->cols = cols;
        j->half = half;
        j->row0 = r0;
        j->row1 = r1;
        j->overflow = 0;
        nj++;
        if (t == nthreads - 1 || r1 >= half) {
            pack_rows(j);
            break;
        }
        if (pthread_create(&tids[launched], 0, pack_worker, j) != 0) {
            pack_rows(j); /* inline fallback; keep going so no range is dropped */
            continue;
        }
        launched++;
    }
    for (int t = 0; t < launched; ++t) pthread_join(tids[t], 0);
    /* compact per-thread slices to the front */
    int64_t total = 0;
    for (int t = 0; t < nj; ++t) {
        if (jobs[t].overflow) return -1;
        int64_t cnt = jobs[t].exc_n;
        int64_t src_off = (int64_t)t * cap_per;
        if (src_off != total) {
            for (int64_t i = 0; i < cnt; ++i) {
                exc_idx[total + i] = exc_idx[src_off + i];
                exc_val[total + i] = exc_val[src_off + i];
            }
        }
        total += cnt;
    }
    return total;
}

typedef struct {
    const uint8_t *rgb;
    uint8_t *grey;
    uint8_t *res; /* optional: channel-sum residual, biased {0,1,2} */
    int64_t n, row0, row1;
} grey_job;

static void *grey_worker(void *arg)
{
    grey_job *j = (grey_job *)arg;
    const uint8_t *s = j->rgb + j->row0 * 3;
    uint8_t *d = j->grey + j->row0;
    uint8_t *r = j->res ? j->res + j->row0 : 0;
    for (int64_t i = j->row0; i < j->row1; ++i) {
        /* round(mean(r,g,b)) = (2*(r+g+b) + 3) / 6 in integers */
        uint32_t sum = (uint32_t)s[0] + s[1] + s[2];
        uint8_t g = (uint8_t)((2u * sum + 3u) / 6u);
        *d++ = g;
        if (r) /* sum = 3*g + (res - 1), res in {0,1,2}: exact channel sum */
            *r++ = (uint8_t)((int32_t)sum - 3 * (int32_t)g + 1);
        s += 3;
    }
    return 0;
}

static void run_grey(const uint8_t *rgb, uint8_t *grey, uint8_t *res,
                     int64_t n, int nthreads)
{
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    pthread_t tids[16];
    grey_job jobs[16];
    int64_t chunk = (n + nthreads - 1) / nthreads;
    int launched = 0;
    for (int t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < n ? r0 + chunk : n;
        if (r0 >= r1) break;
        jobs[t].rgb = rgb;
        jobs[t].grey = grey;
        jobs[t].res = res;
        jobs[t].n = n;
        jobs[t].row0 = r0;
        jobs[t].row1 = r1;
        if (t == nthreads - 1 || r1 >= n) {
            grey_worker(&jobs[t]);
            break;
        }
        if (pthread_create(&tids[launched], 0, grey_worker, &jobs[t]) != 0) {
            grey_worker(&jobs[t]); /* inline fallback; keep going */
            continue;
        }
        launched++;
    }
    for (int t = 0; t < launched; ++t) pthread_join(tids[t], 0);
}

/* rgb: [n, 3] u8 pixels -> grey: [n] u8, rounded mean of channels
 * (reference semantics: imgproc.cc:237-249 uses the channel mean). */
void wire_grey_u8(const uint8_t *rgb, uint8_t *grey, int64_t n, int nthreads)
{
    run_grey(rgb, grey, 0, n, nthreads);
}

/* Like wire_grey_u8 but also emits the channel-sum residual (biased to
 * {0,1,2}) so the device can reconstruct the EXACT integer channel sum:
 * r+g+b = 3*grey + res - 1.  The SIFT grey input then carries no
 * quantization at all (r4: +-1/512 grey quantization perturbed enough
 * keypoints to collapse the camera estimate on the headline bench). */
void wire_grey_res_u8(const uint8_t *rgb, uint8_t *grey, uint8_t *res,
                      int64_t n, int nthreads)
{
    run_grey(rgb, grey, res, n, nthreads);
}

typedef struct {
    const uint8_t *src;
    uint8_t *packed;
    int64_t *exc_idx;
    uint8_t *exc_val;
    int64_t exc_cap, exc_n;
    int64_t rows, cols, quart;
    int64_t row0, row1;
    int overflow;
} pack2_job;

/* Encode quarter-row group r: rows (r, r+Q, r+2Q, r+3Q) pack four 2-bit
 * biased deltas per byte.  Deltas clip to [-2, 1] (bias +2); the rest
 * ride the exception stream.  Chroma planes (r-grey, b-grey) delta to
 * |d| <= 1 for ~98% of photographic pixels, so 0.25 B/px + ~1.5%
 * exceptions beats the 4-bit codec's 0.5 B/px. */
static void pack2_rows_c(pack2_job *j)
{
    const int64_t cols = j->cols, quart = j->quart, rows = j->rows;
    int64_t n = 0;
    for (int64_t r = j->row0; r < j->row1; ++r) {
        uint8_t *p = j->packed + r * cols;
        const uint8_t *s[4];
        uint8_t prev[4] = {0, 0, 0, 0};
        for (int q = 0; q < 4; ++q) {
            int64_t rr = r + q * quart;
            s[q] = rr < rows ? j->src + rr * cols : 0;
        }
        for (int64_t c = 0; c < cols; ++c) {
            uint8_t byte = 0;
            for (int q = 0; q < 4; ++q) {
                uint8_t nq = 2; /* delta 0 for missing rows */
                if (s[q]) {
                    uint8_t v = s[q][c];
                    uint8_t d = (uint8_t)(v - prev[q]);
                    prev[q] = v;
                    nq = (uint8_t)(d + 2);
                    if (nq > 3) {
                        if (n >= j->exc_cap) {
                            j->overflow = 1; j->exc_n = n; return;
                        }
                        j->exc_idx[n] = (r + (int64_t)q * quart) * cols + c;
                        j->exc_val[n] = d;
                        n++;
                        nq = 2;
                    }
                }
                byte |= (uint8_t)(nq << (2 * q));
            }
            p[c] = byte;
        }
    }
    j->exc_n = n;
}

static void *pack2_worker(void *arg)
{
    pack2_rows_c((pack2_job *)arg);
    return 0;
}

/* 2-bit variant of wire_pack4: packed is [(rows+3)/4, cols]; same
 * exception contract (sorted per thread; host merges). */
int64_t wire_pack2(const uint8_t *src, uint8_t *packed, int64_t rows,
                   int64_t cols, int64_t *exc_idx, uint8_t *exc_val,
                   int64_t exc_cap, int nthreads)
{
    int64_t quart = (rows + 3) / 4;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    if (nthreads > quart) nthreads = (int)(quart > 0 ? quart : 1);
    pthread_t tids[16];
    pack2_job jobs[16];
    int64_t chunk = (quart + nthreads - 1) / nthreads;
    int64_t cap_per = exc_cap / nthreads;
    int launched = 0;
    int nj = 0;
    for (int t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < quart ? r0 + chunk : quart;
        if (r0 >= r1) break;
        pack2_job *j = &jobs[nj];
        j->src = src;
        j->packed = packed;
        j->exc_idx = exc_idx + (int64_t)t * cap_per;
        j->exc_val = exc_val + (int64_t)t * cap_per;
        j->exc_cap = cap_per;
        j->exc_n = 0;
        j->rows = rows;
        j->cols = cols;
        j->quart = quart;
        j->row0 = r0;
        j->row1 = r1;
        j->overflow = 0;
        nj++;
        if (t == nthreads - 1 || r1 >= quart) {
            pack2_rows_c(j);
            break;
        }
        if (pthread_create(&tids[launched], 0, pack2_worker, j) != 0) {
            pack2_rows_c(j); /* inline fallback; keep going */
            continue;
        }
        launched++;
    }
    for (int t = 0; t < launched; ++t) pthread_join(tids[t], 0);
    int64_t total = 0;
    for (int t = 0; t < nj; ++t) {
        if (jobs[t].overflow) return -1;
        int64_t cnt = jobs[t].exc_n;
        int64_t src_off = (int64_t)t * cap_per;
        if (src_off != total) {
            for (int64_t i = 0; i < cnt; ++i) {
                exc_idx[total + i] = exc_idx[src_off + i];
                exc_val[total + i] = exc_val[src_off + i];
            }
        }
        total += cnt;
    }
    return total;
}

/* ---- download direction: device-encoded strips, host C decode ----
 *
 * The blended canvas crosses the same ~30-55 MB/s wire device->host, so it
 * gets the same treatment as uploads: the device packs 4-bit (or 2-bit)
 * row-deltas with a sparse exception stream (pure XLA ops — see
 * openpano_tpu/io/wirecodec.py:encode_plane_device), the host decodes here.
 *
 * Exceptions arrive as (absolute flat index, delta byte) pairs; they are
 * applied to the delta plane BEFORE the per-row prefix sum.
 *
 * Reference analog: the blender's canvas write is a free local store
 * (src/stitch/blender.cc:77-94); on this transport the canvas download IS
 * that write and is the dominant blend cost without coding. */

typedef struct {
    const uint8_t *packed;
    uint8_t *out;        /* [rows, cols] delta bytes, then pixels in place */
    int64_t rows, cols, group_rows; /* group_rows = ceil(rows/group) */
    int64_t r0, r1;      /* packed-row range (phase 1) or out-row range (3) */
    int bits;
} unpack_job;

static void unpack_phase1(unpack_job *j)
{
    const int64_t cols = j->cols, gr = j->group_rows, rows = j->rows;
    if (j->bits == 4) {
        for (int64_t r = j->r0; r < j->r1; ++r) {
            const uint8_t *p = j->packed + r * cols;
            uint8_t *lo = j->out + r * cols;
            uint8_t *hi = (r + gr < rows) ? j->out + (r + gr) * cols : 0;
            for (int64_t c = 0; c < cols; ++c) {
                uint8_t b = p[c];
                lo[c] = (uint8_t)((b & 0xF) - 8);
                if (hi) hi[c] = (uint8_t)((b >> 4) - 8);
            }
        }
    } else {
        for (int64_t r = j->r0; r < j->r1; ++r) {
            const uint8_t *p = j->packed + r * cols;
            uint8_t *o[4];
            for (int q = 0; q < 4; ++q) {
                int64_t rr = r + q * gr;
                o[q] = rr < rows ? j->out + rr * cols : 0;
            }
            for (int64_t c = 0; c < cols; ++c) {
                uint8_t b = p[c];
                if (o[0]) o[0][c] = (uint8_t)((b & 3) - 2);
                if (o[1]) o[1][c] = (uint8_t)(((b >> 2) & 3) - 2);
                if (o[2]) o[2][c] = (uint8_t)(((b >> 4) & 3) - 2);
                if (o[3]) o[3][c] = (uint8_t)(((b >> 6) & 3) - 2);
            }
        }
    }
}

static void unpack_phase3(unpack_job *j)
{
    const int64_t cols = j->cols;
    for (int64_t r = j->r0; r < j->r1; ++r) {
        uint8_t *row = j->out + r * cols;
        uint8_t acc = 0;
        for (int64_t c = 0; c < cols; ++c) {
            acc = (uint8_t)(acc + row[c]);
            row[c] = acc;
        }
    }
}

static void *unpack_worker1(void *arg) { unpack_phase1((unpack_job *)arg); return 0; }
static void *unpack_worker3(void *arg) { unpack_phase3((unpack_job *)arg); return 0; }

static void run_unpack_phase(unpack_job *tmpl, int64_t total_rows,
                             int phase, int nthreads)
{
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    if (nthreads > total_rows) nthreads = (int)(total_rows > 0 ? total_rows : 1);
    pthread_t tids[16];
    unpack_job jobs[16];
    int64_t chunk = (total_rows + nthreads - 1) / nthreads;
    int launched = 0;
    void *(*worker)(void *) = phase == 1 ? unpack_worker1 : unpack_worker3;
    for (int t = 0; t < nthreads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < total_rows ? r0 + chunk : total_rows;
        if (r0 >= r1) break;
        jobs[t] = *tmpl;
        jobs[t].r0 = r0;
        jobs[t].r1 = r1;
        if (t == nthreads - 1 || r1 >= total_rows) {
            if (phase == 1) unpack_phase1(&jobs[t]); else unpack_phase3(&jobs[t]);
            break;
        }
        if (pthread_create(&tids[launched], 0, worker, &jobs[t]) != 0) {
            if (phase == 1) unpack_phase1(&jobs[t]); else unpack_phase3(&jobs[t]);
            continue; /* inline fallback; keep going */
        }
        launched++;
    }
    for (int t = 0; t < launched; ++t) pthread_join(tids[t], 0);
}

/* Decode a device-packed plane: packed [ceil(rows/group), cols] (group = 2
 * for bits=4, 4 for bits=2), exceptions as absolute flat indices + delta
 * bytes, into out [rows, cols] u8 pixels. */
void wire_unpack(const uint8_t *packed, int64_t rows, int64_t cols,
                 const int64_t *exc_idx, const uint8_t *exc_val,
                 int64_t n_exc, uint8_t *out, int bits, int nthreads)
{
    int group = bits == 4 ? 2 : 4;
    int64_t gr = (rows + group - 1) / group;
    unpack_job tmpl;
    tmpl.packed = packed;
    tmpl.out = out;
    tmpl.rows = rows;
    tmpl.cols = cols;
    tmpl.group_rows = gr;
    tmpl.bits = bits;
    run_unpack_phase(&tmpl, gr, 1, nthreads);
    const int64_t total = rows * cols;
    for (int64_t i = 0; i < n_exc; ++i) {
        int64_t k = exc_idx[i];
        if (k >= 0 && k < total) out[k] = exc_val[i];
    }
    run_unpack_phase(&tmpl, rows, 3, nthreads);
}
