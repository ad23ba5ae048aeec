// sequitr_tpu native runtime helpers (C++, ctypes ABI).
//
// The reference has no first-party native code (its native layer is the TF
// runtime; SURVEY.md §2 'Native compute layer'); the rebuild's device-side
// native layer is XLA/Pallas. This library covers the HOST-side hot loops
// that sit outside the TPU graph:
//   * union-find connected-component labelling (localization export),
//   * per-label centroid/area accumulation,
//   * crc32c (Castagnoli) for TFRecord framing at shard-write throughput.
//
// Build: see sequitr_tpu/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// connected components: 4-connectivity, two-pass union-find over a 2D mask
// ---------------------------------------------------------------------------

static inline int32_t find_root(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];  // path halving
    x = parent[x];
  }
  return x;
}

// mask: h*w uint8 (nonzero = foreground); labels_out: h*w int32.
// Returns the number of components.
int32_t seq_label_components(const uint8_t* mask, int32_t h, int32_t w,
                             int32_t* labels_out) {
  std::vector<int32_t> parent(1, 0);  // 0 = background sentinel
  // first pass: provisional labels + unions
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = (int64_t)y * w + x;
      if (!mask[i]) {
        labels_out[i] = 0;
        continue;
      }
      const int32_t left = (x > 0) ? labels_out[i - 1] : 0;
      const int32_t up = (y > 0) ? labels_out[i - w] : 0;
      if (left && up) {
        int32_t rl = find_root(parent, left);
        int32_t ru = find_root(parent, up);
        int32_t r = rl < ru ? rl : ru;
        parent[rl] = r;
        parent[ru] = r;
        labels_out[i] = r;
      } else if (left || up) {
        labels_out[i] = left ? left : up;
      } else {
        const int32_t fresh = (int32_t)parent.size();
        parent.push_back(fresh);
        labels_out[i] = fresh;
      }
    }
  }
  // second pass: flatten + densify label ids to 1..n
  std::vector<int32_t> dense(parent.size(), 0);
  int32_t next = 0;
  for (int64_t i = 0; i < (int64_t)h * w; ++i) {
    if (!labels_out[i]) continue;
    const int32_t r = find_root(parent, labels_out[i]);
    if (!dense[r]) dense[r] = ++next;
    labels_out[i] = dense[r];
  }
  return next;
}

// Single-pass per-label feature extraction over an instance label map:
// pixel count, centroid, mean intensity and majority semantic class in ONE
// sweep (the serving pipeline's localization tail previously made four
// scipy passes per frame — sum, center_of_mass, mean, labeled_comprehension).
//   labels:    h*w int32 instance map (0 = background, 1..n_labels)
//   class_map: h*w int32 semantic classes (majority vote per instance)
//   intensity: h*w float32 or nullptr
//   counts buffer: caller-provided n_labels*n_classes int64 scratch
// Outputs: areas (int64), cy/cx/imean (double), cls_out (int32), all n_labels.
void seq_label_full_stats(const int32_t* labels, const int32_t* class_map,
                          const float* intensity, int32_t h, int32_t w,
                          int32_t n_labels, int32_t n_classes, int64_t* counts,
                          int64_t* areas, double* cy, double* cx, double* imean,
                          int32_t* cls_out) {
  std::memset(areas, 0, sizeof(int64_t) * n_labels);
  std::memset(cy, 0, sizeof(double) * n_labels);
  std::memset(cx, 0, sizeof(double) * n_labels);
  std::memset(imean, 0, sizeof(double) * n_labels);
  std::memset(counts, 0, sizeof(int64_t) * n_labels * n_classes);
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = (int64_t)y * w + x;
      const int32_t l = labels[i];
      if (l <= 0 || l > n_labels) continue;
      const int32_t k = l - 1;
      areas[k] += 1;
      cy[k] += y;
      cx[k] += x;
      if (intensity) imean[k] += intensity[i];
      const int32_t c = class_map[i];
      if (c >= 0 && c < n_classes) counts[(int64_t)k * n_classes + c] += 1;
    }
  }
  for (int32_t k = 0; k < n_labels; ++k) {
    if (areas[k]) {
      cy[k] /= (double)areas[k];
      cx[k] /= (double)areas[k];
      imean[k] /= (double)areas[k];
    }
    int64_t best = -1;
    int32_t best_c = 0;
    for (int32_t c = 0; c < n_classes; ++c) {
      const int64_t v = counts[(int64_t)k * n_classes + c];
      if (v > best) {
        best = v;
        best_c = c;
      }
    }
    cls_out[k] = best_c;
  }
}

// Volumetric variant: one sweep over a (Z, H, W) instance map. cz/cy/cx are
// centroid plane/row/col; other outputs as in seq_label_full_stats.
void seq_label_full_stats_3d(const int32_t* labels, const int32_t* class_map,
                             const float* intensity, int32_t z, int32_t h,
                             int32_t w, int32_t n_labels, int32_t n_classes,
                             int64_t* counts, int64_t* areas, double* cz,
                             double* cy, double* cx, double* imean,
                             int32_t* cls_out) {
  std::memset(areas, 0, sizeof(int64_t) * n_labels);
  std::memset(cz, 0, sizeof(double) * n_labels);
  std::memset(cy, 0, sizeof(double) * n_labels);
  std::memset(cx, 0, sizeof(double) * n_labels);
  std::memset(imean, 0, sizeof(double) * n_labels);
  std::memset(counts, 0, sizeof(int64_t) * n_labels * n_classes);
  for (int32_t p = 0; p < z; ++p) {
    for (int32_t y = 0; y < h; ++y) {
      for (int32_t x = 0; x < w; ++x) {
        const int64_t i = ((int64_t)p * h + y) * w + x;
        const int32_t l = labels[i];
        if (l <= 0 || l > n_labels) continue;
        const int32_t k = l - 1;
        areas[k] += 1;
        cz[k] += p;
        cy[k] += y;
        cx[k] += x;
        if (intensity) imean[k] += intensity[i];
        const int32_t c = class_map[i];
        if (c >= 0 && c < n_classes) counts[(int64_t)k * n_classes + c] += 1;
      }
    }
  }
  for (int32_t k = 0; k < n_labels; ++k) {
    if (areas[k]) {
      cz[k] /= (double)areas[k];
      cy[k] /= (double)areas[k];
      cx[k] /= (double)areas[k];
      imean[k] /= (double)areas[k];
    }
    int64_t best = -1;
    int32_t best_c = 0;
    for (int32_t c = 0; c < n_classes; ++c) {
      const int64_t v = counts[(int64_t)k * n_classes + c];
      if (v > best) {
        best = v;
        best_c = c;
      }
    }
    cls_out[k] = best_c;
  }
}

// ---------------------------------------------------------------------------
// crc32c (Castagnoli) — slice-by-8 table-driven
// ---------------------------------------------------------------------------

static uint32_t kCrcTable[8][256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    kCrcTable[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i)
    for (int s = 1; s < 8; ++s)
      kCrcTable[s][i] =
          (kCrcTable[s - 1][i] >> 8) ^ kCrcTable[0][kCrcTable[s - 1][i] & 0xFF];
  crc_init_done = true;
}

uint32_t seq_crc32c(const uint8_t* data, int64_t n) {
  crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t chunk;
    std::memcpy(&chunk, data + i, 8);
    chunk ^= crc;  // little-endian host assumed (x86/arm LE)
    crc = kCrcTable[7][chunk & 0xFF] ^ kCrcTable[6][(chunk >> 8) & 0xFF] ^
          kCrcTable[5][(chunk >> 16) & 0xFF] ^ kCrcTable[4][(chunk >> 24) & 0xFF] ^
          kCrcTable[3][(chunk >> 32) & 0xFF] ^ kCrcTable[2][(chunk >> 40) & 0xFF] ^
          kCrcTable[1][(chunk >> 48) & 0xFF] ^ kCrcTable[0][(chunk >> 56) & 0xFF];
  }
  for (; i < n; ++i) crc = (crc >> 8) ^ kCrcTable[0][(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
