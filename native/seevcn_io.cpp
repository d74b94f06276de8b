// seevcn_io — native data-plane for the TPU pipeline.
//
// Replaces the reference's host-side IO machinery (torch DataLoader worker
// processes + SharedArray shm caches, pcdet/utils/common_utils.py:255,
// datasets/waymo/waymo_dataset.py:34-105) with a C++ thread-pool reader:
// KITTI .bin and binary .pcd files are read and padded into caller-owned
// fixed-shape buffers by background threads, so the Python process streams
// ready-to-upload batches without GIL-bound file IO.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// file readers
// ---------------------------------------------------------------------------

// Read a KITTI .bin (float32 x,y,z,intensity rows). Returns rows read.
int64_t read_bin_file(const char* path, float* out, int64_t max_rows,
                      int64_t row_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  int64_t rows = bytes / (int64_t)(row_floats * sizeof(float));
  if (rows > max_rows) rows = max_rows;
  int64_t got = (int64_t)fread(out, row_floats * sizeof(float), rows, f);
  fclose(f);
  return got;
}

// Read a binary .pcd with FIELDS x y z (the format both we and the reference
// SEE stage write). Returns points read, -1 on error, -2 on unsupported.
int64_t read_pcd_file(const char* path, float* out, int64_t max_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n_points = -1;
  bool binary = false;
  int n_fields = 0;
  while (fgets(line, sizeof(line), f)) {
    if (strncmp(line, "FIELDS", 6) == 0) {
      const char* p = line + 6;
      while (*p) { if (*p == 'x' || *p == 'y' || *p == 'z') n_fields++; p++; }
    } else if (strncmp(line, "POINTS", 6) == 0) {
      n_points = strtoll(line + 6, nullptr, 10);
    } else if (strncmp(line, "DATA", 4) == 0) {
      binary = (strstr(line, "binary") != nullptr);
      break;
    }
  }
  if (n_points < 0 || !binary || n_fields != 3) { fclose(f); return -2; }
  if (n_points > max_rows) n_points = max_rows;
  int64_t got = (int64_t)fread(out, 3 * sizeof(float), n_points, f);
  fclose(f);
  return got;
}

// ---------------------------------------------------------------------------
// threaded prefetcher
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  float* out;          // caller-owned (max_rows, row_floats) buffer
  int64_t max_rows;
  int64_t row_floats;  // 4 for .bin, 3 for .pcd
  int64_t* n_rows_out; // caller-owned result slot
  uint64_t ticket;
};

class Prefetcher {
 public:
  Prefetcher(int n_threads) : stop_(false), completed_(0), submitted_(0) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  uint64_t submit(const char* path, float* out, int64_t max_rows,
                  int64_t row_floats, int64_t* n_rows_out) {
    std::lock_guard<std::mutex> lk(mu_);
    uint64_t ticket = ++submitted_;
    jobs_.push(Job{path, out, max_rows, row_floats, n_rows_out, ticket});
    cv_.notify_one();
    return ticket;
  }

  // Block until every job with ticket <= `ticket` has completed.
  void wait(uint64_t ticket) {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [&] { return completed_done_ >= ticket; });
  }

 private:
  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = jobs_.front();
        jobs_.pop();
      }
      int64_t n;
      if (job.row_floats == 3)
        n = read_pcd_file(job.path.c_str(), job.out, job.max_rows);
      else
        n = read_bin_file(job.path.c_str(), job.out, job.max_rows,
                          job.row_floats);
      *job.n_rows_out = n;
      {
        std::lock_guard<std::mutex> lk(mu_);
        finished_.push_back(job.ticket);
        // completed_done_ = highest ticket T such that all tickets <= T done
        completed_++;
        std::sort(finished_.begin(), finished_.end());
        while (!finished_.empty() &&
               finished_.front() == completed_done_ + 1) {
          completed_done_++;
          finished_.erase(finished_.begin());
        }
      }
      done_cv_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::queue<Job> jobs_;
  std::vector<std::thread> workers_;
  std::vector<uint64_t> finished_;
  bool stop_;
  uint64_t completed_;
  uint64_t submitted_;
  uint64_t completed_done_ = 0;
};

}  // namespace

extern "C" {

int64_t seevcn_read_bin(const char* path, float* out, int64_t max_rows,
                        int64_t row_floats) {
  return read_bin_file(path, out, max_rows, row_floats);
}

int64_t seevcn_read_pcd(const char* path, float* out, int64_t max_rows) {
  return read_pcd_file(path, out, max_rows);
}

void* seevcn_prefetcher_create(int n_threads) {
  return new Prefetcher(n_threads);
}

void seevcn_prefetcher_destroy(void* p) { delete (Prefetcher*)p; }

uint64_t seevcn_prefetcher_submit(void* p, const char* path, float* out,
                                  int64_t max_rows, int64_t row_floats,
                                  int64_t* n_rows_out) {
  return ((Prefetcher*)p)->submit(path, out, max_rows, row_floats, n_rows_out);
}

void seevcn_prefetcher_wait(void* p, uint64_t ticket) {
  ((Prefetcher*)p)->wait(ticket);
}

}  // extern "C"
