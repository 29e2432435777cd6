// Stage-output dumper for test fixtures.
//
// Links against the reference encoder's static library (built separately
// under /tmp) and dumps intermediate arrays of the butteraugli pipeline for
// deterministic pseudo-random images. The resulting raw float32 files are
// the golden values for guetzli_tpu's JAX reimplementation — the same idea
// as the reference's own --checkcl dual-execution mode, with the reference
// CPU path as the oracle.
//
// Usage: dump_ref <outdir>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "butteraugli/butteraugli.h"
#include "guetzli/butteraugli_comparator.h"
#include "guetzli/gamma_correct.h"
#include "guetzli/jpeg_data_encoder.h"
#include "guetzli/jpeg_data_writer.h"
#include "guetzli/output_image.h"
#include "guetzli/quality.h"

namespace {

uint32_t g_state = 123456789u;
uint32_t NextRand() {
  // xorshift32
  g_state ^= g_state << 13;
  g_state ^= g_state >> 17;
  g_state ^= g_state << 5;
  return g_state;
}

void WriteArray(const std::string& path, const float* data, size_t n) {
  FILE* f = fopen(path.c_str(), "wb");
  fwrite(data, sizeof(float), n, f);
  fclose(f);
}

void WriteVec(const std::string& path, const std::vector<float>& v) {
  WriteArray(path, v.data(), v.size());
}

void WritePlanes(const std::string& path,
                 const std::vector<std::vector<float>>& planes) {
  FILE* f = fopen(path.c_str(), "wb");
  for (const auto& p : planes) fwrite(p.data(), sizeof(float), p.size(), f);
  fclose(f);
}

// Expose the protected stage methods.
class StageComparator : public butteraugli::ButteraugliComparator {
 public:
  using butteraugli::ButteraugliComparator::ButteraugliComparator;
  using butteraugli::ButteraugliComparator::BlockDiffMap;
  using butteraugli::ButteraugliComparator::EdgeDetectorMap;
  using butteraugli::ButteraugliComparator::EdgeDetectorLowFreq;
  using butteraugli::ButteraugliComparator::CombineChannels;
};

std::vector<uint8_t> MakeRgb(int w, int h) {
  std::vector<uint8_t> rgb(3 * w * h);
  // Smooth-ish content plus noise so masks/edges are non-trivial.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        int base = (x * (5 + c) + y * (3 + c)) % 256;
        int noise = NextRand() % 64;
        rgb[3 * (y * w + x) + c] = (uint8_t)((base + noise) % 256);
      }
    }
  }
  return rgb;
}

std::vector<std::vector<float>> ToLinear(const std::vector<uint8_t>& rgb,
                                         int w, int h) {
  const double* lut = guetzli::Srgb8ToLinearTable();
  std::vector<std::vector<float>> out(3, std::vector<float>(w * h));
  for (int p = 0; p < w * h; ++p)
    for (int c = 0; c < 3; ++c) out[c][p] = (float)lut[rgb[3 * p + c]];
  return out;
}

void DumpForSize(const std::string& dir, int w, int h) {
  char tag[64];
  snprintf(tag, sizeof(tag), "%dx%d", w, h);
  std::string pre = dir + "/" + tag + "_";

  std::vector<uint8_t> rgb0 = MakeRgb(w, h);
  std::vector<uint8_t> rgb1 = MakeRgb(w, h);
  // Make image1 a perturbed copy of image0 (like a compression artifact).
  for (size_t i = 0; i < rgb1.size(); ++i) {
    int v = rgb0[i] + (int)(NextRand() % 11) - 5;
    rgb1[i] = (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : v);
  }
  {
    FILE* f = fopen((pre + "rgb0.u8").c_str(), "wb");
    fwrite(rgb0.data(), 1, rgb0.size(), f);
    fclose(f);
    f = fopen((pre + "rgb1.u8").c_str(), "wb");
    fwrite(rgb1.data(), 1, rgb1.size(), f);
    fclose(f);
  }

  auto lin0 = ToLinear(rgb0, w, h);
  auto lin1 = ToLinear(rgb1, w, h);
  WritePlanes(pre + "lin0.f32", lin0);

  // Individual blurs on the linear green channel.
  const double sigmas[] = {1.1, 1.5, 0.586, 0.4, 4.53358927369,
                           9.65781083553, 14.2644604355, 8.8510880283};
  for (double s : sigmas) {
    std::vector<float> ch = lin0[1];
    butteraugli::Blur(w, h, ch.data(), s, 0.0);
    char name[64];
    snprintf(name, sizeof(name), "blur_%.6f.f32", s);
    WriteVec(pre + name, ch);
  }
  {
    std::vector<float> ch = lin0[1];
    butteraugli::Blur(w, h, ch.data(), 8.8510880283, 0.03027655136);
    WriteVec(pre + "blur_diffmap_border.f32", ch);
  }

  // Opsin dynamics images.
  auto xyb0 = lin0;
  auto xyb1 = lin1;
  butteraugli::OpsinDynamicsImage(w, h, xyb0);
  butteraugli::OpsinDynamicsImage(w, h, xyb1);
  WritePlanes(pre + "xyb0.f32", xyb0);
  WritePlanes(pre + "xyb1.f32", xyb1);

  // MaskHighIntensityChange.
  auto m0 = xyb0, m1 = xyb1;
  butteraugli::MaskHighIntensityChange(w, h, xyb0, xyb1, m0, m1);
  WritePlanes(pre + "mhic0.f32", m0);
  WritePlanes(pre + "mhic1.f32", m1);

  // Mask.
  std::vector<std::vector<float>> mask, mask_dc;
  butteraugli::Mask(m0, m1, w, h, &mask, &mask_dc);
  WritePlanes(pre + "mask.f32", mask);
  WritePlanes(pre + "mask_dc.f32", mask_dc);

  // Stage maps at step=3.
  StageComparator cmp(w, h, 3);
  size_t res_x = (w + 2) / 3, res_y = (h + 2) / 3;
  std::vector<float> edge(3 * res_x * res_y);
  cmp.EdgeDetectorMap(m0, m1, &edge);
  WriteVec(pre + "edge_map.f32", edge);
  std::vector<float> bdc(3 * res_x * res_y), bac(3 * res_x * res_y);
  cmp.BlockDiffMap(m0, m1, &bdc, &bac);
  WriteVec(pre + "block_dc.f32", bdc);
  WriteVec(pre + "block_ac.f32", bac);
  cmp.EdgeDetectorLowFreq(m0, m1, &bac);
  WriteVec(pre + "block_ac_lf.f32", bac);

  // Full diffmap (uses fresh opsin copies since the call mutates inputs).
  auto d0 = xyb0, d1 = xyb1;
  std::vector<float> result;
  butteraugli::ButteraugliComparator full(w, h, 3);
  full.DiffmapOpsinDynamicsImage(d0, d1, result);
  WriteVec(pre + "diffmap.f32", result);
  float score = (float)butteraugli::ButteraugliScoreFromDiffmap(result);
  WriteArray(pre + "score.f32", &score, 1);

  // ButteraugliBlockDiff on 4 extracted 8x8 block pairs.
  if (w >= 16 && h >= 16) {
    std::vector<float> out;
    double b0[192], b1[192];
    for (int bi = 0; bi < 4; ++bi) {
      int bx = (bi % 2) * 8, by = (bi / 2) * 8;
      for (int c = 0; c < 3; ++c)
        for (int iy = 0; iy < 8; ++iy)
          for (int ix = 0; ix < 8; ++ix) {
            int src = (by + iy) * w + bx + ix;
            b0[c * 64 + iy * 8 + ix] = m0[c][src];
            b1[c * 64 + iy * 8 + ix] = m1[c][src];
          }
      double dc[3] = {0}, ac[3] = {0}, edge_dc[3] = {0};
      butteraugli::ButteraugliBlockDiff(b0, b1, dc, ac, edge_dc);
      for (int c = 0; c < 3; ++c) out.push_back((float)dc[c]);
      for (int c = 0; c < 3; ++c) out.push_back((float)ac[c]);
      for (int c = 0; c < 3; ++c) out.push_back((float)edge_dc[c]);
    }
    WriteVec(pre + "blockdiff.f32", out);
  }

  // Initial RGB->JPEG encode (quant all ones) + writer: dump coefficients
  // and the serialized bytes for codec parity tests.
  {
    guetzli::JPEGData jpg;
    guetzli::EncodeRGBToJpeg(rgb0, w, h, &jpg);
    std::vector<float> coeffs;
    for (int c = 0; c < 3; ++c)
      for (auto v : jpg.components[c].coeffs) coeffs.push_back((float)v);
    WriteVec(pre + "init_coeffs.f32", coeffs);
    std::string encoded;
    auto out_cb = [](void* data, const uint8_t* buf, size_t count) -> int {
      ((std::string*)data)->append((const char*)buf, count);
      return (int)count;
    };
    guetzli::JPEGOutput out(out_cb, &encoded);
    guetzli::WriteJpeg(jpg, true, out);
    FILE* f = fopen((pre + "init.jpg").c_str(), "wb");
    fwrite(encoded.data(), 1, encoded.size(), f);
    fclose(f);

    // Decoded pixels of the quant=1 roundtrip (OutputImage/ToSRGB path).
    guetzli::OutputImage img(w, h);
    img.CopyFromJpegData(jpg);
    std::vector<uint8_t> srgb = img.ToSRGB();
    f = fopen((pre + "roundtrip_srgb.u8").c_str(), "wb");
    fwrite(srgb.data(), 1, srgb.size(), f);
    fclose(f);
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string dir = argc > 1 ? argv[1] : ".";
  DumpForSize(dir, 96, 64);
  DumpForSize(dir, 37, 29);
  printf("fixtures written to %s\n", dir.c_str());
  return 0;
}
