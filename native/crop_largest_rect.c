/* Largest all-valid axis-aligned rectangle in a binary mask.
 *
 * Native runtime component of the TPU panorama engine: the final crop step
 * (reference behavior: lib/imgproc.cc:200-235, the classic
 * largest-rectangle-in-histogram DP over rows) is inherently sequential and
 * runs on host; this C implementation keeps it O(h*w) at native speed for
 * gigapixel canvases.
 *
 * valid: row-major h*w uint8 (1 = valid pixel).
 * out:   [y0, x0, height, width] of the maximal rectangle.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

void largest_valid_rect(const uint8_t *valid, int64_t h, int64_t w,
                        int64_t out[4]) {
  int64_t *height = (int64_t *)calloc((size_t)w, sizeof(int64_t));
  int64_t *left = (int64_t *)malloc((size_t)w * sizeof(int64_t));
  int64_t *right = (int64_t *)malloc((size_t)w * sizeof(int64_t));
  int64_t maxarea = 0, ll = 0, hh = 0, nl = 0, ww = 0;
  for (int64_t line = 0; line < h; line++) {
    const uint8_t *row = valid + line * w;
    for (int64_t k = 0; k < w; k++)
      height[k] = row[k] ? height[k] + 1 : 0;
    for (int64_t k = 0; k < w; k++) {
      left[k] = k;
      while (left[k] > 0 && height[k] <= height[left[k] - 1])
        left[k] = left[left[k] - 1];
    }
    for (int64_t k = w - 1; k >= 0; k--) {
      right[k] = k;
      while (right[k] < w - 1 && height[k] <= height[right[k] + 1])
        right[k] = right[right[k] + 1];
    }
    for (int64_t k = 0; k < w; k++) {
      int64_t area = (right[k] - left[k] + 1) * height[k];
      if (area > maxarea) {
        maxarea = area;
        ll = left[k];
        ww = right[k] - left[k] + 1;
        hh = height[k];
        nl = line;
      }
    }
  }
  out[0] = nl - hh + 1; /* y0 */
  out[1] = ll;          /* x0 */
  out[2] = hh;          /* height */
  out[3] = ww;          /* width */
  free(height);
  free(left);
  free(right);
}
