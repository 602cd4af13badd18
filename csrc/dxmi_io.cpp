// dxmi_io: native host-I/O helpers for dxmi_tpu.
//
// The DxMI evaluation protocol dumps 10k-50k PNGs per FID round
// (reference generate_cifar10.py:195-209 does this serially through
// PIL/torchvision and is host-bound). This library provides a
// zlib-backed PNG encoder with an internal thread pool so the TPU never
// waits on image encoding. Exposed to Python via ctypes
// (dxmi_tpu/utils/native_io.py); plain C ABI, no pybind11 dependency.
//
// Build: make -C csrc    (produces libdxmi_io.so)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

void put_u32_be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void write_chunk(std::vector<uint8_t>& out, const char type[4],
                 const uint8_t* data, size_t len) {
  put_u32_be(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_u32_be(out, crc);
}

// Encode an 8-bit RGB/greyscale image into an in-memory PNG.
bool encode_png(const uint8_t* pixels, int h, int w, int c,
                std::vector<uint8_t>& png) {
  if (c != 1 && c != 3 && c != 4) return false;

  // filter type 0 (None) per scanline; compression handled by zlib
  std::vector<uint8_t> raw((static_cast<size_t>(w) * c + 1) * h);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (w * c + 1);
    row[0] = 0;  // filter: none
    std::memcpy(row + 1, pixels + static_cast<size_t>(y) * w * c,
                static_cast<size_t>(w) * c);
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(bound);
  // level 1: FID/eval consumers only need a valid PNG; speed wins
  if (compress2(z.data(), &bound, raw.data(), static_cast<uLong>(raw.size()),
                1) != Z_OK) {
    return false;
  }
  z.resize(bound);

  png.clear();
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;  // bit depth
  ihdr[9] = (c == 1) ? 0 : (c == 3 ? 2 : 6);  // colour type
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  write_chunk(png, "IHDR", ihdr, 13);
  write_chunk(png, "IDAT", z.data(), z.size());
  write_chunk(png, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(data.data(), 1, data.size(), f);
  std::fclose(f);
  return n == data.size();
}

// ---------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { loop(); });
    }
  }

  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
      ++pending_;
    }
    cv_.notify_one();
  }

  void wait_all() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int pending_;
};

Pool* g_pool = nullptr;
std::atomic<long> g_errors{0};

}  // namespace

extern "C" {

// Initialise the writer pool (idempotent). n_threads <= 0 -> hw threads.
void dxmi_io_init(int n_threads) {
  if (g_pool) return;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
  }
  g_pool = new Pool(n_threads);
}

// Asynchronously encode+write one image (copies the pixel buffer).
// Returns 0 on submit success.
int dxmi_io_write_png_async(const char* path, const uint8_t* pixels, int h,
                            int w, int c) {
  if (!g_pool) dxmi_io_init(0);
  std::string p(path);
  std::vector<uint8_t> copy(pixels,
                            pixels + static_cast<size_t>(h) * w * c);
  g_pool->submit([p = std::move(p), img = std::move(copy), h, w, c] {
    std::vector<uint8_t> png;
    if (!encode_png(img.data(), h, w, c, png) || !write_file(p.c_str(), png)) {
      ++g_errors;
    }
  });
  return 0;
}

// Synchronous single-image write. Returns 0 on success.
int dxmi_io_write_png(const char* path, const uint8_t* pixels, int h, int w,
                      int c) {
  std::vector<uint8_t> png;
  if (!encode_png(pixels, h, w, c, png)) return 1;
  return write_file(path, png) ? 0 : 2;
}

// Block until all queued writes finish; returns accumulated error count.
long dxmi_io_flush() {
  if (g_pool) g_pool->wait_all();
  return g_errors.exchange(0);
}

}  // extern "C"
