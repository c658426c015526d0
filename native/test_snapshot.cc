// Standalone smoke test for the async snapshot writer.
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
void* sw_open(const char*, const char*, int, const int64_t*);
int sw_append(void*, const void*, int64_t);
int sw_pending(void*);
int64_t sw_close(void*);
}

int main() {
  int64_t shape[2] = {4, 6};
  void* h = sw_open("/tmp/sw_test.npy", "<f8", 2, shape);
  assert(h);
  std::vector<double> frame(24);
  for (int t = 0; t < 100; ++t) {
    for (auto& v : frame) v = t;
    assert(sw_append(h, frame.data(), frame.size() * 8) == 0);
  }
  int64_t frames = sw_close(h);
  std::printf("frames written: %lld\n", static_cast<long long>(frames));
  assert(frames == 100);
  std::printf("OK\n");
  return 0;
}
