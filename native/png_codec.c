/* Minimal native PNG codec (zlib-backed).
 *
 * Plays the role the reference's vendored lodepng plays (lib/imgio.cc:25-61,
 * SURVEY 2.5): host-side PNG decode/encode for the image IO layer.  Decodes
 * 8-bit gray / gray+alpha / palette / RGB / RGBA (non-interlaced) to RGB8;
 * encodes RGB8 with the Sub filter (photographic rows delta-code well, the
 * same observation behind native/delta_code.c).
 *
 * Returned buffers are malloc'd; release with pano_free().
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static uint32_t be32(const uint8_t *p)
{
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static void put_be32(uint8_t *p, uint32_t v)
{
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)v;
}

static int paeth(int a, int b, int c)
{
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

/* undo PNG row filters in place over the raw inflated stream
 * (1 filter byte + w*bpp bytes per row) */
static int unfilter(uint8_t *raw, int64_t w, int64_t h, int bpp)
{
    int64_t stride = (int64_t)w * bpp;
    for (int64_t y = 0; y < h; ++y) {
        uint8_t *row = raw + y * (stride + 1);
        uint8_t ft = row[0];
        uint8_t *cur = row + 1;
        const uint8_t *up = y ? raw + (y - 1) * (stride + 1) + 1 : 0;
        switch (ft) {
        case 0:
            break;
        case 1: /* Sub */
            for (int64_t x = bpp; x < stride; ++x)
                cur[x] = (uint8_t)(cur[x] + cur[x - bpp]);
            break;
        case 2: /* Up */
            if (up)
                for (int64_t x = 0; x < stride; ++x)
                    cur[x] = (uint8_t)(cur[x] + up[x]);
            break;
        case 3: /* Average */
            for (int64_t x = 0; x < stride; ++x) {
                int a = x >= bpp ? cur[x - bpp] : 0;
                int b = up ? up[x] : 0;
                cur[x] = (uint8_t)(cur[x] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (int64_t x = 0; x < stride; ++x) {
                int a = x >= bpp ? cur[x - bpp] : 0;
                int b = up ? up[x] : 0;
                int c = (up && x >= bpp) ? up[x - bpp] : 0;
                cur[x] = (uint8_t)(cur[x] + paeth(a, b, c));
            }
            break;
        default:
            return -1;
        }
    }
    return 0;
}

/* Decode a PNG byte buffer to malloc'd RGB8 [h*w*3].  NULL on error. */
uint8_t *png_decode_rgb8(const uint8_t *buf, int64_t len, int64_t *out_w,
                         int64_t *out_h)
{
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (len < 8 + 25 || memcmp(buf, sig, 8) != 0) return 0;

    int64_t w = 0, h = 0;
    int depth = 0, ctype = 0, interlace = 0;
    uint8_t plte[256][3];
    int plte_n = 0;

    /* first pass: IHDR + total IDAT size */
    int64_t pos = 8, idat_total = 0;
    while (pos + 12 <= len) {
        uint32_t clen = be32(buf + pos);
        const uint8_t *tag = buf + pos + 4;
        const uint8_t *data = buf + pos + 8;
        if (pos + 12 + (int64_t)clen > len) return 0;
        if (!memcmp(tag, "IHDR", 4) && clen >= 13) {
            w = be32(data);
            h = be32(data + 4);
            depth = data[8];
            ctype = data[9];
            interlace = data[12];
        } else if (!memcmp(tag, "PLTE", 4)) {
            plte_n = (int)(clen / 3);
            if (plte_n > 256) plte_n = 256;
            memcpy(plte, data, (size_t)plte_n * 3);
        } else if (!memcmp(tag, "IDAT", 4)) {
            idat_total += clen;
        } else if (!memcmp(tag, "IEND", 4)) {
            break;
        }
        pos += 12 + clen;
    }
    if (w <= 0 || h <= 0 || depth != 8 || interlace != 0 || idat_total <= 0)
        return 0;
    int ch;
    switch (ctype) {
    case 0: ch = 1; break;       /* gray */
    case 2: ch = 3; break;       /* rgb */
    case 3: ch = 1; break;       /* palette index */
    case 4: ch = 2; break;       /* gray+alpha */
    case 6: ch = 4; break;       /* rgba */
    default: return 0;
    }
    if (w > (int64_t)1 << 30 || h > (int64_t)1 << 30) return 0;

    /* gather IDAT payload */
    uint8_t *zbuf = (uint8_t *)malloc((size_t)idat_total);
    if (!zbuf) return 0;
    int64_t zn = 0;
    pos = 8;
    while (pos + 12 <= len) {
        uint32_t clen = be32(buf + pos);
        const uint8_t *tag = buf + pos + 4;
        if (!memcmp(tag, "IDAT", 4)) {
            memcpy(zbuf + zn, buf + pos + 8, clen);
            zn += clen;
        } else if (!memcmp(tag, "IEND", 4)) {
            break;
        }
        pos += 12 + clen;
    }

    int64_t stride = w * ch;
    int64_t raw_len = (stride + 1) * h;
    uint8_t *raw = (uint8_t *)malloc((size_t)raw_len);
    if (!raw) { free(zbuf); return 0; }
    uLongf dlen = (uLongf)raw_len;
    int zr = uncompress(raw, &dlen, zbuf, (uLong)zn);
    free(zbuf);
    if (zr != Z_OK || (int64_t)dlen != raw_len) { free(raw); return 0; }
    if (unfilter(raw, w, h, ch) != 0) { free(raw); return 0; }

    uint8_t *rgb = (uint8_t *)malloc((size_t)(w * h * 3));
    if (!rgb) { free(raw); return 0; }
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t *src = raw + y * (stride + 1) + 1;
        uint8_t *dst = rgb + y * w * 3;
        switch (ctype) {
        case 0:
            for (int64_t x = 0; x < w; ++x)
                dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = src[x];
            break;
        case 2:
            memcpy(dst, src, (size_t)(w * 3));
            break;
        case 3:
            for (int64_t x = 0; x < w; ++x) {
                int idx = src[x] < plte_n ? src[x] : 0;
                dst[3 * x] = plte[idx][0];
                dst[3 * x + 1] = plte[idx][1];
                dst[3 * x + 2] = plte[idx][2];
            }
            break;
        case 4:
            for (int64_t x = 0; x < w; ++x)
                dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = src[2 * x];
            break;
        case 6:
            for (int64_t x = 0; x < w; ++x) {
                dst[3 * x] = src[4 * x];
                dst[3 * x + 1] = src[4 * x + 1];
                dst[3 * x + 2] = src[4 * x + 2];
            }
            break;
        }
    }
    free(raw);
    *out_w = w;
    *out_h = h;
    return rgb;
}

static void write_chunk(uint8_t **p, const char *tag, const uint8_t *data,
                        uint32_t len)
{
    uint8_t *q = *p;
    put_be32(q, len);
    memcpy(q + 4, tag, 4);
    if (len) memcpy(q + 8, data, len);
    uLong crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, q + 4, len + 4);
    put_be32(q + 8 + len, (uint32_t)crc);
    *p = q + 12 + len;
}

/* Encode RGB8 [h*w*3] to a malloc'd PNG byte buffer.  NULL on error. */
uint8_t *png_encode_rgb8(const uint8_t *rgb, int64_t w, int64_t h,
                         int64_t *out_len)
{
    if (w <= 0 || h <= 0) return 0;
    int64_t stride = w * 3;
    int64_t raw_len = (stride + 1) * h;
    uint8_t *raw = (uint8_t *)malloc((size_t)raw_len);
    if (!raw) return 0;
    for (int64_t y = 0; y < h; ++y) {
        uint8_t *row = raw + y * (stride + 1);
        const uint8_t *src = rgb + y * stride;
        row[0] = 1; /* Sub filter */
        uint8_t *cur = row + 1;
        for (int64_t x = 0; x < 3; ++x) cur[x] = src[x];
        for (int64_t x = 3; x < stride; ++x)
            cur[x] = (uint8_t)(src[x] - src[x - 3]);
    }
    uLongf zcap = compressBound((uLong)raw_len);
    uint8_t *zbuf = (uint8_t *)malloc(zcap);
    if (!zbuf) { free(raw); return 0; }
    int zr = compress2(zbuf, &zcap, raw, (uLong)raw_len, 6);
    free(raw);
    if (zr != Z_OK) { free(zbuf); return 0; }

    int64_t total = 8 + 25 + (12 + (int64_t)zcap) + 12;
    uint8_t *png = (uint8_t *)malloc((size_t)total);
    if (!png) { free(zbuf); return 0; }
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    memcpy(png, sig, 8);
    uint8_t *p = png + 8;
    uint8_t ihdr[13];
    put_be32(ihdr, (uint32_t)w);
    put_be32(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;  /* depth */
    ihdr[9] = 2;  /* RGB */
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    write_chunk(&p, "IHDR", ihdr, 13);
    write_chunk(&p, "IDAT", zbuf, (uint32_t)zcap);
    write_chunk(&p, "IEND", 0, 0);
    free(zbuf);
    *out_len = p - png;
    return png;
}

void pano_free(void *p) { free(p); }
