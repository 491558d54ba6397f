// lanetpu native host ops: the framework's host-side data plane.
//
// Role parity: the reference leans on two external native layers — OpenCV
// (C++) for host image geometry (resize / warpPerspective / letterbox,
// reference src/unet_ros_node.py:300-310, src/py_utils/coco_utils.py:48-76)
// and the RKNN runtime for device execution. In this framework the device
// side is XLA; this library re-creates the *host* native layer: image
// geometry for paths that must run host-side (capture staging, CPU-only
// deployments) plus a lock-free SPSC frame ring buffer for the streaming
// pipeline's capture->batcher handoff (the reference approximates this with
// a Python lock + latest-frame cache, src/yolo_detector.py:240-249).
//
// Exposed as a plain C ABI consumed via ctypes (lanetpu/native/hostops.py).
// Build: make -C lanetpu/native

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Bilinear resize, uint8 HWC, cv2 half-pixel-center semantics
// ---------------------------------------------------------------------------

void ltpu_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                             uint8_t* dst, int dh, int dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;

  std::vector<int> x0(dw), x1(dw);
  std::vector<float> wx(dw);
  for (int x = 0; x < dw; ++x) {
    float sx = (x + 0.5f) * scale_x - 0.5f;
    float fx = std::floor(sx);
    wx[x] = sx - fx;
    int i0 = static_cast<int>(fx);
    x0[x] = std::min(std::max(i0, 0), sw - 1);
    x1[x] = std::min(std::max(i0 + 1, 0), sw - 1);
  }

  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * scale_y - 0.5f;
    float fy = std::floor(sy);
    float wy = sy - fy;
    int iy = static_cast<int>(fy);
    int y0 = std::min(std::max(iy, 0), sh - 1);
    int y1 = std::min(std::max(iy + 1, 0), sh - 1);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * c;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * c;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = row0 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p01 = row0 + static_cast<size_t>(x1[x]) * c;
      const uint8_t* p10 = row1 + static_cast<size_t>(x0[x]) * c;
      const uint8_t* p11 = row1 + static_cast<size_t>(x1[x]) * c;
      float w00 = (1 - wy) * (1 - wx[x]);
      float w01 = (1 - wy) * wx[x];
      float w10 = wy * (1 - wx[x]);
      float w11 = wy * wx[x];
      for (int k = 0; k < c; ++k) {
        float v = w00 * p00[k] + w01 * p01[k] + w10 * p10[k] + w11 * p11[k];
        out[static_cast<size_t>(x) * c + k] =
            static_cast<uint8_t>(std::min(255.0f, std::max(0.0f,
                                                           std::round(v))));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Perspective warp, uint8 HWC, inverse mapping, BORDER_CONSTANT 0
// minv: row-major 3x3 inverse homography (dst -> src)
// ---------------------------------------------------------------------------

void ltpu_warp_perspective_u8(const uint8_t* src, int sh, int sw, int c,
                              const double* minv, uint8_t* dst, int dh,
                              int dw) {
  for (int y = 0; y < dh; ++y) {
    uint8_t* out = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      double den = minv[6] * x + minv[7] * y + minv[8];
      if (std::fabs(den) < 1e-12) den = 1e-12;
      double sx = (minv[0] * x + minv[1] * y + minv[2]) / den;
      double sy = (minv[3] * x + minv[4] * y + minv[5]) / den;
      int ix = static_cast<int>(std::floor(sx));
      int iy = static_cast<int>(std::floor(sy));
      float fx = static_cast<float>(sx - ix);
      float fy = static_cast<float>(sy - iy);
      for (int k = 0; k < c; ++k) {
        float acc = 0.0f;
        for (int dy = 0; dy < 2; ++dy) {
          int yy = iy + dy;
          if (yy < 0 || yy >= sh) continue;
          float wyv = dy ? fy : 1 - fy;
          for (int dx = 0; dx < 2; ++dx) {
            int xx = ix + dx;
            if (xx < 0 || xx >= sw) continue;
            float wv = wyv * (dx ? fx : 1 - fx);
            acc += wv *
                   src[(static_cast<size_t>(yy) * sw + xx) * c + k];
          }
        }
        out[static_cast<size_t>(x) * c + k] = static_cast<uint8_t>(
            std::min(255.0f, std::max(0.0f, std::round(acc))));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy NMS over xyxy boxes (reference-equivalent epsilon handling)
// Returns number of kept indices written to `keep`.
// ---------------------------------------------------------------------------

int ltpu_nms(const float* boxes, const float* scores, int n, float iou_thresh,
             int* keep, int max_keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    float w = boxes[i * 4 + 2] - boxes[i * 4 + 0];
    float h = boxes[i * 4 + 3] - boxes[i * 4 + 1];
    areas[i] = w * h;
  }
  std::vector<char> removed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_keep; ++oi) {
    int i = order[oi];
    if (removed[i]) continue;
    keep[kept++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (removed[j]) continue;
      float xx1 = std::max(boxes[i * 4 + 0], boxes[j * 4 + 0]);
      float yy1 = std::max(boxes[i * 4 + 1], boxes[j * 4 + 1]);
      float xx2 = std::min(boxes[i * 4 + 2], boxes[j * 4 + 2]);
      float yy2 = std::min(boxes[i * 4 + 3], boxes[j * 4 + 3]);
      float w = std::max(0.0f, xx2 - xx1 + 1e-5f);
      float h = std::max(0.0f, yy2 - yy1 + 1e-5f);
      float inter = w * h;
      float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > iou_thresh) removed[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC frame ring buffer (capture thread -> batcher thread)
// ---------------------------------------------------------------------------

struct FrameRing {
  std::vector<uint8_t> storage;
  size_t frame_bytes;
  size_t capacity;
  std::atomic<uint64_t> head{0};  // next write slot (producer)
  std::atomic<uint64_t> tail{0};  // next read slot (consumer)
  std::atomic<uint64_t> dropped{0};
};

void* ltpu_ring_create(size_t frame_bytes, size_t capacity) {
  auto* r = new FrameRing();
  r->frame_bytes = frame_bytes;
  r->capacity = capacity;
  r->storage.resize(frame_bytes * capacity);
  return r;
}

void ltpu_ring_destroy(void* ring) { delete static_cast<FrameRing*>(ring); }

// Push a frame; drops the OLDEST pending frame when full (latest-frame
// semantics, matching ROS queue_size=1 behavior). Returns 1 if a frame was
// dropped to make room.
int ltpu_ring_push(void* ring, const uint8_t* frame) {
  auto* r = static_cast<FrameRing*>(ring);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  int dropped = 0;
  if (head - tail >= r->capacity) {
    // advance tail: overwrite oldest (consumer may lose one frame)
    r->tail.compare_exchange_strong(tail, tail + 1,
                                    std::memory_order_acq_rel);
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    dropped = 1;
  }
  std::memcpy(&r->storage[(head % r->capacity) * r->frame_bytes], frame,
              r->frame_bytes);
  r->head.store(head + 1, std::memory_order_release);
  return dropped;
}

// Pop into `out`; returns 1 on success, 0 if empty (or the frame was
// overwritten mid-copy — caller just retries). The producer may steal the
// tail slot when the ring is full, so the copy is validated afterwards and
// the tail is claimed with CAS.
int ltpu_ring_pop(void* ring, uint8_t* out) {
  auto* r = static_cast<FrameRing*>(ring);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) return 0;
  std::memcpy(out, &r->storage[(tail % r->capacity) * r->frame_bytes],
              r->frame_bytes);
  // If the producer lapped this slot while we copied, the data is torn.
  uint64_t head2 = r->head.load(std::memory_order_acquire);
  if (head2 - tail > r->capacity) return 0;
  // Claim the slot; fails if the producer's drop path advanced tail.
  if (!r->tail.compare_exchange_strong(tail, tail + 1,
                                       std::memory_order_acq_rel)) {
    return 0;
  }
  return 1;
}

uint64_t ltpu_ring_size(void* ring) {
  auto* r = static_cast<FrameRing*>(ring);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

uint64_t ltpu_ring_dropped(void* ring) {
  return static_cast<FrameRing*>(ring)->dropped.load(
      std::memory_order_relaxed);
}

}  // extern "C"
