// Async snapshot writer: background-thread .npy stream appender.
//
// The reference's runtime is C++ (libtorch drivers) and its snapshot path
// blocks the simulation: every driver accumulates full time-stacked tensors
// in RAM and serialises them at the end (e.g. the {H,W,9,T} stacks of
// test/horizontal_poiseuille_test.cpp:85-110).  This component is the
// TPU-framework equivalent done natively: a lock-free-enough producer/
// consumer queue whose consumer thread does the disk writes, so snapshot
// serialisation overlaps device compute and never holds the Python GIL
// (ctypes releases it around every call).
//
// C ABI (used from lbm_tpu/io/native.py via ctypes):
//   void*  sw_open(const char* path, const char* dtype_descr,
//                  int ndim, const int64_t* shape);  // per-frame shape
//   int    sw_append(void* h, const void* data, int64_t nbytes); // copies
//   int    sw_pending(void* h);                      // queued, unwritten
//   int64_t sw_close(void* h);                       // drain, finalize hdr
//
// Build: make -C native   (g++ -O2 -shared -fPIC, pthreads)

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

std::string npy_header(const std::string& descr,
                       const std::vector<int64_t>& frame_shape,
                       int64_t count) {
  std::string shape = "(" + std::to_string(count) + ",";
  for (size_t i = 0; i < frame_shape.size(); ++i) {
    shape += " " + std::to_string(frame_shape[i]) + ",";
  }
  shape += ")";
  std::string dict = "{'descr': '" + descr +
                     "', 'fortran_order': False, 'shape': " + shape + ", }";
  // version 2.0 header: 12-byte preamble + dict padded to 64-byte multiple.
  // The placeholder (count 0) and final (count N) headers must be the SAME
  // size so the close-time rewrite is in-place: pad both to the size a
  // worst-case 20-digit count would need.
  size_t worst = dict.size() + (20 - std::to_string(count).size());
  size_t unpadded = 12 + worst + 1;  // + newline
  size_t padded = (unpadded + 63) / 64 * 64;
  dict.append(padded - (12 + dict.size() + 1), ' ');
  dict.push_back('\n');
  std::string out;
  out.reserve(padded);
  out += "\x93NUMPY";
  out.push_back(2);
  out.push_back(0);
  uint32_t hlen = static_cast<uint32_t>(dict.size());
  out.append(reinterpret_cast<const char*>(&hlen), 4);
  out += dict;
  return out;
}

struct Writer {
  FILE* file = nullptr;
  std::string descr;
  std::vector<int64_t> frame_shape;
  int64_t frames_written = 0;
  bool error = false;

  std::deque<std::vector<char>> queue;
  std::mutex mu;
  std::condition_variable cv;
  bool closing = false;
  std::thread thread;

  void run() {
    for (;;) {
      std::vector<char> item;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return closing || !queue.empty(); });
        if (queue.empty()) {
          if (closing) return;
          continue;
        }
        item = std::move(queue.front());
        queue.pop_front();
      }
      if (!error) {
        size_t n = fwrite(item.data(), 1, item.size(), file);
        if (n != item.size()) error = true;
        ++frames_written;
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* sw_open(const char* path, const char* dtype_descr, int ndim,
              const int64_t* shape) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new Writer();
  w->file = f;
  w->descr = dtype_descr;
  w->frame_shape.assign(shape, shape + ndim);
  // placeholder header (count 0), rewritten on close
  std::string hdr = npy_header(w->descr, w->frame_shape, 0);
  if (std::fwrite(hdr.data(), 1, hdr.size(), f) != hdr.size()) {
    std::fclose(f);
    delete w;
    return nullptr;
  }
  w->thread = std::thread([w] { w->run(); });
  return w;
}

int sw_append(void* handle, const void* data, int64_t nbytes) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || w->error) return -1;
  std::vector<char> buf(static_cast<size_t>(nbytes));
  std::memcpy(buf.data(), data, static_cast<size_t>(nbytes));
  {
    std::lock_guard<std::mutex> lock(w->mu);
    w->queue.push_back(std::move(buf));
  }
  w->cv.notify_all();
  return 0;
}

int sw_pending(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  std::lock_guard<std::mutex> lock(w->mu);
  return static_cast<int>(w->queue.size());
}

int64_t sw_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  {
    std::lock_guard<std::mutex> lock(w->mu);
    w->closing = true;
  }
  w->cv.notify_all();
  w->thread.join();
  int64_t frames = w->error ? -1 : w->frames_written;
  if (!w->error) {
    std::string hdr = npy_header(w->descr, w->frame_shape, w->frames_written);
    std::fseek(w->file, 0, SEEK_SET);
    std::fwrite(hdr.data(), 1, hdr.size(), w->file);
  }
  std::fclose(w->file);
  delete w;
  return frames;
}

}  // extern "C"
