// pope_native: host-side native runtime ops for the TPU framework.
//
// Replaces the reference's compiled host dependencies on the mask
// post-processing path: the column-major RLE codec (reference:
// segment_anything/utils/amg.py:107-152, which round-trips through
// torch/numpy) and the connected-component small-region removal
// (amg.py:342-372, which calls cv2.connectedComponentsWithStats).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Binding: ctypes (pope_tpu/native.py); no pybind11 in this image.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Column-major RLE encode of a binary HxW mask (row-major uint8 input).
// Runs alternate starting with the zero run. Returns the number of runs
// written to `counts` (capacity must be >= h*w + 1).
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, int64_t* counts) {
    int64_t n_runs = 0;
    int64_t run = 0;
    uint8_t cur = 0;  // first run counts zeros
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v == cur) {
                ++run;
            } else {
                counts[n_runs++] = run;
                cur = v;
                run = 1;
            }
        }
    }
    counts[n_runs++] = run;
    return n_runs;
}

// Inverse of rle_encode: fills a row-major uint8 HxW mask.
void rle_decode(const int64_t* counts, int64_t n_runs, int64_t h, int64_t w,
                uint8_t* mask) {
    int64_t idx = 0;
    uint8_t cur = 0;
    for (int64_t r = 0; r < n_runs; ++r) {
        for (int64_t k = 0; k < counts[r]; ++k) {
            int64_t x = idx / h;
            int64_t y = idx % h;
            mask[y * w + x] = cur;
            ++idx;
        }
        cur = 1 - cur;
    }
}

namespace {
// Union-find over the pixel grid.
struct DSU {
    std::vector<int32_t> parent;
    explicit DSU(int64_t n) : parent(n) {
        for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;
    }
    int32_t find(int32_t a) {
        while (parent[a] != a) {
            parent[a] = parent[parent[a]];
            a = parent[a];
        }
        return a;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a != b) parent[b] = a;
    }
};
}  // namespace

// 8-connected component labelling of `value` pixels (0 or 1) in the mask
// (cv2.connectedComponentsWithStats(..., 8) semantics, the reference's
// default in segment_anything/utils/amg.py:352).
// Writes int32 labels (0..n_components-1 over matching pixels, -1 elsewhere)
// and per-component areas into `areas` (capacity h*w). Returns component
// count.
int64_t connected_components(const uint8_t* mask, int64_t h, int64_t w,
                             uint8_t value, int32_t* labels, int64_t* areas) {
    const int64_t n = h * w;
    DSU dsu(n);
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            int64_t i = y * w + x;
            if ((mask[i] ? 1 : 0) != value) continue;
            if (x + 1 < w && (mask[i + 1] ? 1 : 0) == value) dsu.unite((int32_t)i, (int32_t)(i + 1));
            if (y + 1 < h && (mask[i + w] ? 1 : 0) == value) dsu.unite((int32_t)i, (int32_t)(i + w));
            if (y + 1 < h && x + 1 < w && (mask[i + w + 1] ? 1 : 0) == value)
                dsu.unite((int32_t)i, (int32_t)(i + w + 1));
            if (y + 1 < h && x > 0 && (mask[i + w - 1] ? 1 : 0) == value)
                dsu.unite((int32_t)i, (int32_t)(i + w - 1));
        }
    }
    std::vector<int32_t> root_label(n, -1);
    int64_t n_comp = 0;
    for (int64_t i = 0; i < n; ++i) {
        if ((mask[i] ? 1 : 0) != value) {
            labels[i] = -1;
            continue;
        }
        int32_t r = dsu.find((int32_t)i);
        if (root_label[r] < 0) {
            root_label[r] = (int32_t)n_comp;
            areas[n_comp] = 0;
            ++n_comp;
        }
        labels[i] = root_label[r];
        ++areas[root_label[r]];
    }
    return n_comp;
}

// Remove small regions (amg.py:342-372 semantics):
//   mode=0 ("holes"): fill background components smaller than area_thresh.
//   mode=1 ("islands"): drop foreground components smaller than area_thresh;
//     when EVERY island is below threshold, keep the largest one instead of
//     emptying the mask (amg.py:360-362).
// `changed` is 1 when any small region existed (the reference reports True
// even when keep-largest leaves the pixels unchanged).
int32_t remove_small_regions(uint8_t* mask, int64_t h, int64_t w,
                             int64_t area_thresh, int32_t mode) {
    const int64_t n = h * w;
    std::vector<int32_t> labels(n);
    std::vector<int64_t> areas(n);
    uint8_t target = mode == 0 ? 0 : 1;
    int64_t n_comp = connected_components(mask, h, w, target, labels.data(), areas.data());
    int32_t any_small = 0;
    int64_t n_large = 0;
    int32_t largest = -1;
    for (int64_t c = 0; c < n_comp; ++c) {
        if (areas[c] < area_thresh) any_small = 1;
        else ++n_large;
        if (largest < 0 || areas[c] > areas[largest]) largest = (int32_t)c;
    }
    if (!any_small) return 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t l = labels[i];
        if (l < 0 || areas[l] >= area_thresh) continue;
        if (mode == 1 && n_large == 0 && l == largest) continue;  // keep largest
        mask[i] = target ? 0 : 1;  // flip small regions
    }
    return any_small;
}

// Greedy NMS over XYXY boxes, descending score order; writes keep flags.
// Host fallback twin of the on-chip Pallas/XLA NMS for CPU-side tooling.
void nms_cpu(const float* boxes, const float* scores, int64_t n,
             float iou_threshold, uint8_t* keep) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    for (int64_t i = 1; i < n; ++i) {  // insertion sort by score desc
        int64_t j = i;
        while (j > 0 && scores[order[j - 1]] < scores[order[j]]) {
            std::swap(order[j - 1], order[j]);
            --j;
        }
    }
    std::vector<uint8_t> suppressed(n, 0);
    for (int64_t oi = 0; oi < n; ++oi) {
        int64_t i = order[oi];
        if (suppressed[i]) {
            keep[i] = 0;
            continue;
        }
        keep[i] = 1;
        const float* a = boxes + 4 * i;
        float area_a = (a[2] - a[0]) * (a[3] - a[1]);
        for (int64_t oj = oi + 1; oj < n; ++oj) {
            int64_t j = order[oj];
            if (suppressed[j]) continue;
            const float* b = boxes + 4 * j;
            float xa = a[0] > b[0] ? a[0] : b[0];
            float ya = a[1] > b[1] ? a[1] : b[1];
            float xb = a[2] < b[2] ? a[2] : b[2];
            float yb = a[3] < b[3] ? a[3] : b[3];
            float iw = xb - xa > 0 ? xb - xa : 0;
            float ih = yb - ya > 0 ? yb - ya : 0;
            float inter = iw * ih;
            float area_b = (b[2] - b[0]) * (b[3] - b[1]);
            float uni = area_a + area_b - inter;
            if (uni > 0 && inter / uni > iou_threshold) suppressed[j] = 1;
        }
    }
}

}  // extern "C"
