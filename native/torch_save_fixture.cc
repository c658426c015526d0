// Generates a GENUINE C++ `torch::save` artifact for the interop loader.
//
// The reference dumps results with exactly this API
// (/root/reference/test/horizontal_poiseuille_test.cpp:157-160:
// `torch::save(ux, "hpt-ux.pt")` on double {R,C,...} CUDA tensors moved to
// CPU); io/compare.py's jit-archive branch must be able to read such dumps.
// This tool is compiled against the libtorch bundled inside the installed
// torch wheel (see the `torch-fixture` target in the Makefile) and its
// output is committed at tests/fixtures/cpp_torch_save_fixture.pt so the
// loader test exercises a real C++ artifact, not a Python-synthesized one.
//
// Fixture contents: a {6,5,9} double tensor in the reference's {R,C,9}
// layout with t[r][c][k] = (100r + 10c + k) / 7.0 — integer arithmetic and
// one exact IEEE division, so the Python test recomputes it bit-for-bit.
#include <torch/torch.h>

#include <cstdio>

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "cpp_torch_save_fixture.pt";
  torch::Tensor t = torch::empty({6, 5, 9}, torch::kDouble);
  auto a = t.accessor<double, 3>();
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 5; ++c)
      for (int k = 0; k < 9; ++k)
        a[r][c][k] = static_cast<double>(100 * r + 10 * c + k) / 7.0;
  torch::save(t, path);  // the exact call the reference drivers make
  std::printf("wrote %s\n", path);
  return 0;
}
