// Native host-side hot loops for the data/metrics pipeline.
//
// The reference spends ~10 min building class-uniform centroids with a
// python thread pool over scipy center_of_mass (datasets/uniform.py:84-164)
// and funnels eval histograms through numpy bincount. These are the two
// host-side hot loops; both are single-pass O(pixels) in C++.
//
// Built as a plain shared library (no pybind11 in the image), called via
// ctypes; see tpuseg/native/__init__.py.

#include <cstdint>
#include <cstring>

extern "C" {

// Confusion matrix: out[gt * num_classes + pred] += 1 for valid gt.
// (semantics of tpuseg.evaluation.metrics.fast_hist)
void fast_hist_i32(const int32_t* pred, const int32_t* gt, int64_t n,
                   int32_t num_classes, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t g = gt[i];
        if (g < 0 || g >= num_classes) continue;
        int32_t p = pred[i];
        if (p < 0) p = 0;
        if (p >= num_classes) p = num_classes - 1;
        out[(int64_t)g * num_classes + p] += 1;
    }
}

// Per-tile per-class centroid accumulation over a uint8 trainId mask.
// For tile (ty, tx) and class c the outputs are indexed
//   idx = ((ty * tiles_x) + tx) * num_classes + c
// counts[idx]  += 1        per pixel of class c in the tile
// sum_y[idx]   += y (absolute image coords)
// sum_x[idx]   += x
// Centroid = (sum_x / count, sum_y / count); mirrors
// scipy.ndimage.center_of_mass on the binary tile mask
// (reference: uniform.py:123-133).
void tile_class_centroids_u8(const uint8_t* mask, int32_t h, int32_t w,
                             int32_t tile, int32_t num_classes,
                             int64_t* counts, int64_t* sum_y,
                             int64_t* sum_x) {
    int32_t tiles_y = h / tile;
    int32_t tiles_x = w / tile;
    for (int32_t ty = 0; ty < tiles_y; ++ty) {
        for (int32_t y = ty * tile; y < (ty + 1) * tile; ++y) {
            const uint8_t* row = mask + (int64_t)y * w;
            for (int32_t tx = 0; tx < tiles_x; ++tx) {
                int64_t base = ((int64_t)ty * tiles_x + tx) * num_classes;
                for (int32_t x = tx * tile; x < (tx + 1) * tile; ++x) {
                    uint8_t c = row[x];
                    if (c >= num_classes) continue;
                    counts[base + c] += 1;
                    sum_y[base + c] += y;
                    sum_x[base + c] += x;
                }
            }
        }
    }
}

// uint8 lookup-table remap (id -> trainId), in place capable.
void remap_u8(const uint8_t* src, uint8_t* dst, int64_t n,
              const uint8_t* table) {
    for (int64_t i = 0; i < n; ++i) dst[i] = table[src[i]];
}

}  // extern "C"
