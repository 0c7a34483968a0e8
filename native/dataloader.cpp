// Native host-side batch gather for the input pipeline.
//
// The reference leans on torch's C++ DataLoader worker pool (6 workers,
// train.py:155) to hide per-item HDF5 reads and float conversion.  Here the
// equivalent hot loop — gathering B uint8 images (memmap) + captions by
// index into one contiguous batch buffer — is a C++ thread pool driven
// through ctypes, so the Python producer thread spends its time in
// device_put, not in numpy fancy-indexing.
//
// Images stay uint8 NHWC end-to-end (normalization runs on-TPU), so this is
// a pure wide memcpy problem: each worker copies a contiguous H*W*3 block
// per sample.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), active_(0) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void run(const std::function<void(int64_t)>& fn, int64_t n_items) {
    {
      std::unique_lock<std::mutex> lk(m_);
      fn_ = &fn;
      next_ = 0;
      total_ = n_items;
      done_ = 0;
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(m_);
    done_cv_.wait(lk, [this] { return done_ == total_; });
    fn_ = nullptr;
  }

 private:
  void worker() {
    for (;;) {
      const std::function<void(int64_t)>* fn;
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [this] { return stop_ || (fn_ && next_ < total_); });
        if (stop_) return;
        fn = fn_;
      }
      for (;;) {
        const int64_t i = next_.fetch_add(1);
        if (i >= total_) break;
        (*fn)(i);
        {
          std::unique_lock<std::mutex> lk(m_);
          if (++done_ == total_) done_cv_.notify_all();
        }
      }
    }
  }

  std::vector<std::thread> workers_;
  std::mutex m_;
  std::condition_variable cv_, done_cv_;
  const std::function<void(int64_t)>* fn_ = nullptr;
  std::atomic<int64_t> next_{0};
  int64_t total_ = 0;
  int64_t done_ = 0;
  bool stop_;
  int active_;
};

ThreadPool* pool = nullptr;
int pool_size = 0;

}  // namespace

extern "C" {

void ensure_pool(int n_threads) {
  if (pool && pool_size == n_threads) return;
  delete pool;
  pool = new ThreadPool(n_threads);
  pool_size = n_threads;
}

// Gather B samples: images[img_indices[i]] -> out_images[i],
// captions[cap_indices[i]] -> out_captions[i], caplens likewise.
// item_bytes = H*W*3; cap_len = caption row length (int32 elements).
void gather_batch(const uint8_t* images, int64_t item_bytes,
                  const int32_t* captions, const int32_t* caplens,
                  int64_t cap_len, const int64_t* img_indices,
                  const int64_t* cap_indices, int64_t batch,
                  uint8_t* out_images, int32_t* out_captions,
                  int32_t* out_caplens, int n_threads) {
  ensure_pool(n_threads);
  auto fn = std::function<void(int64_t)>([&](int64_t i) {
    std::memcpy(out_images + i * item_bytes, images + img_indices[i] * item_bytes,
                static_cast<size_t>(item_bytes));
    std::memcpy(out_captions + i * cap_len, captions + cap_indices[i] * cap_len,
                static_cast<size_t>(cap_len) * sizeof(int32_t));
    out_caplens[i] = caplens[cap_indices[i]];
  });
  pool->run(fn, batch);
}

}  // extern "C"
