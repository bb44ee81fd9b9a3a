// collide2d_native — native runtime pieces of the TPU framework.
//
// Two roles (both host-side; the compute path is JAX/XLA/Pallas):
//
// 1. Reference-compatible randomness. The CUDA reference samples its
//    pose/variance tables with libstdc++'s std::default_random_engine
//    (default-seeded; /root/reference/generate_dataset.cu:279-330) and
//    shuffles every emitted batch with
//    std::shuffle(..., std::default_random_engine(0))
//    (/root/reference/generate_dataset.cu:496). Those sequences are
//    libstdc++ implementation details; compiling the *actual* libstdc++
//    code here reproduces them bit-for-bit, giving byte-identical
//    poses.npy / variances.npy / batch row order when refcompat mode is
//    requested. The Python default path uses numpy RNG instead.
//
// 2. An asynchronous .npy batch writer: a worker thread drains a queue
//    of (path, rows) jobs so device compute overlaps file IO — the
//    host<->device overlap the reference lacks (synchronous cudaMemcpy +
//    synchronous save, generate_dataset.cu:461-500; SURVEY.md P3).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Reference-compatible RNG (std::default_random_engine = minstd_rand0 on
// libstdc++, identical to the engine the reference instantiates).
// ---------------------------------------------------------------------------

void* c2_engine_new(uint64_t seed, int default_seeded) {
  if (default_seeded) return new std::default_random_engine();
  return new std::default_random_engine(
      static_cast<std::default_random_engine::result_type>(seed));
}

void c2_engine_free(void* engine) {
  delete static_cast<std::default_random_engine*>(engine);
}

// Fill out[n*dims] row-major, looping rows-outer/dims-inner exactly like
// the reference's table loops (generate_dataset.cu:294-301, 325-330):
// one uniform_real_distribution<float> per dimension, shared engine.
void c2_uniform_table(void* engine, float* out, int64_t n, int32_t dims,
                      const float* mins, const float* maxs) {
  auto* g = static_cast<std::default_random_engine*>(engine);
  std::vector<std::uniform_real_distribution<float>> dists;
  dists.reserve(dims);
  for (int32_t d = 0; d < dims; ++d)
    dists.emplace_back(mins[d], maxs[d]);
  for (int64_t i = 0; i < n; ++i)
    for (int32_t d = 0; d < dims; ++d)
      out[i * dims + d] = dists[d](*g);
}

// The permutation applied by std::shuffle(v.begin(), v.end(),
// std::default_random_engine(seed)) — out[i] = index of the input row
// that ends up at position i (so shuffled = rows[out]).
void c2_std_shuffle_perm(int64_t n, uint64_t seed, int64_t* out) {
  std::vector<int64_t> idx(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) idx[static_cast<size_t>(i)] = i;
  std::default_random_engine g(
      static_cast<std::default_random_engine::result_type>(seed));
  std::shuffle(idx.begin(), idx.end(), g);
  std::memcpy(out, idx.data(), sizeof(int64_t) * static_cast<size_t>(n));
}

// ---------------------------------------------------------------------------
// Async npy writer (v1.0 format, float32, C order).
// ---------------------------------------------------------------------------

namespace {

struct WriteJob {
  std::string path;
  std::vector<float> data;
  std::vector<int64_t> shape;
};

class AsyncNpyWriter {
 public:
  AsyncNpyWriter() : stop_(false), errors_(0) {
    worker_ = std::thread([this] { this->Run(); });
  }
  ~AsyncNpyWriter() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }

  void Submit(WriteJob job) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push_back(std::move(job));
    }
    cv_.notify_all();
  }

  // Block until the queue is drained; returns the error count so far.
  int64_t Flush() {
    std::unique_lock<std::mutex> lk(mu_);
    drained_.wait(lk, [this] { return queue_.empty() && !busy_; });
    return errors_;
  }

 private:
  static bool WriteNpy(const WriteJob& job) {
    std::string header = "{'descr': '<f4', 'fortran_order': False, 'shape': (";
    for (size_t i = 0; i < job.shape.size(); ++i) {
      header += std::to_string(job.shape[i]);
      if (job.shape.size() == 1 || i + 1 < job.shape.size()) header += ",";
      if (i + 1 < job.shape.size()) header += " ";
    }
    header += "), }";
    // Pad with spaces so magic(6)+version(2)+hlen(2)+header is 64-aligned,
    // terminated by '\n' (npy v1.0).
    size_t unpadded = 10 + header.size() + 1;
    size_t padded = (unpadded + 63) / 64 * 64;
    header.append(padded - unpadded, ' ');
    header += '\n';

    // Atomic publish: write to a temp name, rename into place only on a
    // fully successful write. A run killed mid-write must never leave a
    // truncated {i}.npy that --resume / get_num_batches_in_dir would
    // count as a complete batch.
    std::string tmp = job.path + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return false;
    const unsigned char magic[8] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0};
    uint16_t hlen = static_cast<uint16_t>(header.size());
    bool ok = std::fwrite(magic, 1, 8, f) == 8 &&
              std::fwrite(&hlen, 2, 1, f) == 1 &&
              std::fwrite(header.data(), 1, header.size(), f) == header.size() &&
              std::fwrite(job.data.data(), sizeof(float), job.data.size(), f) ==
                  job.data.size();
    ok = (std::fclose(f) == 0) && ok;
    if (ok) ok = (std::rename(tmp.c_str(), job.path.c_str()) == 0);
    if (!ok) std::remove(tmp.c_str());
    return ok;
  }

  void Run() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(queue_.front());
        queue_.pop_front();
        busy_ = true;
      }
      bool ok = WriteNpy(job);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (!ok) ++errors_;
        busy_ = false;
        if (queue_.empty()) drained_.notify_all();
      }
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable drained_;
  std::deque<WriteJob> queue_;
  std::thread worker_;
  bool stop_;
  bool busy_ = false;
  int64_t errors_;
};

}  // namespace

void* c2_writer_new() { return new AsyncNpyWriter(); }

void c2_writer_free(void* w) { delete static_cast<AsyncNpyWriter*>(w); }

void c2_writer_submit(void* w, const char* path, const float* data,
                      const int64_t* shape, int32_t ndim) {
  WriteJob job;
  job.path = path;
  int64_t total = 1;
  for (int32_t i = 0; i < ndim; ++i) {
    job.shape.push_back(shape[i]);
    total *= shape[i];
  }
  job.data.assign(data, data + total);
  static_cast<AsyncNpyWriter*>(w)->Submit(std::move(job));
}

int64_t c2_writer_flush(void* w) {
  return static_cast<AsyncNpyWriter*>(w)->Flush();
}

}  // extern "C"
