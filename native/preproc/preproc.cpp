// Native batch preprocessing: JPEG decode + letterbox + BGR->RGB, threaded.
//
// The host-side hot path for the 5k img/s north star (BASELINE.md): python
// dataloaders pay GIL/process overhead per image; this library decodes and
// letterboxes a whole batch across std::thread workers in one C call.
// Exposed with a C ABI consumed via ctypes (yololp_tpu/data/native.py).
//
// Letterbox semantics match data_augment.py:30 with auto=False (fixed square
// output, 114-gray pad) — identical to the device pipeline's expectations.
//
// Build: make -C native/preproc

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

// decode one JPEG/PNG buffer -> letterboxed RGB uint8 into out (size*size*3)
// scaleup=0 caps the resize ratio at 1 (the val protocol: never upscale,
// matching python letterbox(scaleup=False)); scaleup=1 matches the infer
// protocol (small images are upscaled to fill the square).
bool process_one(const uint8_t* data, int64_t len, int size, int scaleup,
                 uint8_t* out, float* ratio, float* pad_w, float* pad_h) {
  cv::Mat raw(1, static_cast<int>(len), CV_8UC1,
              const_cast<uint8_t*>(data));
  cv::Mat bgr = cv::imdecode(raw, cv::IMREAD_COLOR);
  if (bgr.empty()) return false;

  float r = std::min(size / static_cast<float>(bgr.rows),
                     size / static_cast<float>(bgr.cols));
  if (!scaleup) r = std::min(r, 1.0f);
  int new_w = static_cast<int>(std::lround(bgr.cols * r));
  int new_h = static_cast<int>(std::lround(bgr.rows * r));
  cv::Mat resized;
  cv::resize(bgr, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);

  float dw = (size - new_w) / 2.0f, dh = (size - new_h) / 2.0f;
  int top = static_cast<int>(std::lround(dh - 0.1));
  int left = static_cast<int>(std::lround(dw - 0.1));

  cv::Mat canvas(size, size, CV_8UC3, cv::Scalar(114, 114, 114));
  resized.copyTo(canvas(cv::Rect(left, top, new_w, new_h)));
  cv::Mat rgb(size, size, CV_8UC3, out);
  cv::cvtColor(canvas, rgb, cv::COLOR_BGR2RGB);
  *ratio = r;
  *pad_w = dw;
  *pad_h = dh;
  return true;
}

}  // namespace

extern "C" {

// Batch API. jpeg_data: concatenated encoded buffers; offsets: n+1 entries.
// out: (n, size, size, 3) uint8; ratios/pads: (n,) float each.
// Returns number of successfully decoded images.
int yololp_decode_letterbox_batch(const uint8_t* jpeg_data,
                                  const int64_t* offsets, int n, int size,
                                  int scaleup, int num_threads, uint8_t* out,
                                  float* ratios, float* pads_w,
                                  float* pads_h) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  }
  num_threads = std::max(1, std::min(num_threads, n));
  std::vector<int> ok(n, 0);
  const int64_t img_bytes = static_cast<int64_t>(size) * size * 3;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      ok[i] = process_one(jpeg_data + offsets[i], offsets[i + 1] - offsets[i],
                          size, scaleup, out + i * img_bytes, &ratios[i],
                          &pads_w[i], &pads_h[i])
                  ? 1
                  : 0;
      if (!ok[i]) {
        std::memset(out + i * img_bytes, 114, img_bytes);
        ratios[i] = 1.0f;
        pads_w[i] = pads_h[i] = 0.0f;
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();

  int n_ok = 0;
  for (int v : ok) n_ok += v;
  return n_ok;
}

// Single pre-decoded image variant (BGR uint8 HxWx3 in, letterboxed RGB out).
void yololp_letterbox_rgb(const uint8_t* bgr, int h, int w, int size,
                          uint8_t* out, float* ratio, float* pad_w,
                          float* pad_h) {
  cv::Mat img(h, w, CV_8UC3, const_cast<uint8_t*>(bgr));
  float r = std::min(size / static_cast<float>(h), size / static_cast<float>(w));
  int new_w = static_cast<int>(std::lround(w * r));
  int new_h = static_cast<int>(std::lround(h * r));
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
  float dw = (size - new_w) / 2.0f, dh = (size - new_h) / 2.0f;
  int top = static_cast<int>(std::lround(dh - 0.1));
  int left = static_cast<int>(std::lround(dw - 0.1));
  cv::Mat canvas(size, size, CV_8UC3, cv::Scalar(114, 114, 114));
  resized.copyTo(canvas(cv::Rect(left, top, new_w, new_h)));
  cv::Mat rgb(size, size, CV_8UC3, out);
  cv::cvtColor(canvas, rgb, cv::COLOR_BGR2RGB);
  *ratio = r;
  *pad_w = dw;
  *pad_h = dh;
}

}  // extern "C"
