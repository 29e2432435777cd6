// Native PNG decoder: the framework's own libpng analog (the reference
// links libpng; guetzli.cc:51-153). Supports the subset libpng's
// PACKING|EXPAND|STRIP_16 transforms produce for the reference CLI:
// 8/16-bit gray, gray+alpha, palette (+tRNS), RGB, RGBA; bit depths
// 1/2/4/8/16; non-interlaced and Adam7; all five filter types. Output is
// always 8-bit RGB with the reference's alpha blend-on-black
// `(val*alpha + 128)/255` (guetzli.cc:47-49).

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  uint32_t u32() {
    if (pos + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[pos]) << 24) | (uint32_t(p[pos + 1]) << 16) |
                 (uint32_t(p[pos + 2]) << 8) | uint32_t(p[pos + 3]);
    pos += 4;
    return v;
  }
};

inline uint8_t blend_on_black(int val, int alpha) {
  return (uint8_t)((val * alpha + 128) / 255);
}

inline int paeth(int a, int b, int c) {
  int pp = a + b - c;
  int pa = pp > a ? pp - a : a - pp;
  int pb = pp > b ? pp - b : b - pp;
  int pc = pp > c ? pp - c : c - pp;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Unfilter one IDAT-decoded image pass in place; raw holds rows of
// (1 filter byte + rowbytes). Returns false on bad filter type.
bool unfilter(uint8_t* raw, int height, size_t rowbytes, int bpp) {
  std::vector<uint8_t> prev(rowbytes, 0);
  for (int y = 0; y < height; ++y) {
    uint8_t* row = raw + (size_t)y * (rowbytes + 1);
    int ft = row[0];
    uint8_t* d = row + 1;
    switch (ft) {
      case 0: break;
      case 1:
        for (size_t x = bpp; x < rowbytes; ++x) d[x] += d[x - bpp];
        break;
      case 2:
        for (size_t x = 0; x < rowbytes; ++x) d[x] += prev[x];
        break;
      case 3:
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= (size_t)bpp ? d[x - bpp] : 0;
          d[x] += (uint8_t)((a + prev[x]) >> 1);
        }
        break;
      case 4:
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= (size_t)bpp ? d[x - bpp] : 0;
          int c = x >= (size_t)bpp ? prev[x - bpp] : 0;
          d[x] += (uint8_t)paeth(a, prev[x], c);
        }
        break;
      default:
        return false;
    }
    memcpy(prev.data(), d, rowbytes);
  }
  return true;
}

// Extract sample `i` of a row with the given bit depth (<=8), scaled up to
// 0..255 per the PNG expansion rules for grayscale; raw index for palette.
inline int sample_raw(const uint8_t* row, int i, int depth) {
  switch (depth) {
    case 1: return (row[i >> 3] >> (7 - (i & 7))) & 1;
    case 2: return (row[i >> 2] >> (6 - 2 * (i & 3))) & 3;
    case 4: return (row[i >> 1] >> (4 - 4 * (i & 1))) & 15;
    default: return row[i];
  }
}

inline int scale_gray(int v, int depth) {
  switch (depth) {
    case 1: return v * 255;
    case 2: return v * 85;
    case 4: return v * 17;
    default: return v;
  }
}

const int kA7X0[7] = {0, 4, 0, 2, 0, 1, 0};
const int kA7Y0[7] = {0, 0, 4, 0, 2, 0, 1};
const int kA7DX[7] = {8, 8, 4, 4, 2, 2, 1};
const int kA7DY[7] = {8, 8, 8, 4, 4, 2, 2};

}  // namespace

extern "C" {

// Decode PNG -> RGB8. Returns 0 on success (fills out[3*w*h], w/h from a
// prior gt_png_dims call), negative error codes otherwise.
int64_t gt_png_dims(const uint8_t* data, int64_t len, int32_t* w,
                    int32_t* h) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 33 || memcmp(data, sig, 8) != 0) return -1;
  Reader r{data, (size_t)len, 8};
  uint32_t clen = r.u32();
  uint32_t ctype = r.u32();
  if (!r.ok || clen != 13 || ctype != 0x49484452u) return -2;  // IHDR
  *w = (int32_t)r.u32();
  *h = (int32_t)r.u32();
  if (*w <= 0 || *h <= 0) return -3;
  return 0;
}

int64_t gt_png_decode(const uint8_t* data, int64_t len, uint8_t* out,
                      int64_t out_cap) {
  int32_t w32, h32;
  int64_t rc = gt_png_dims(data, len, &w32, &h32);
  if (rc) return rc;
  int64_t w = w32, h = h32;
  if (out_cap < 3 * w * h) return -4;

  Reader r{data, (size_t)len, 16};
  r.u32(); r.u32();  // w, h already read
  if (r.pos + 5 > r.n) return -2;
  int depth = data[r.pos];
  int color = data[r.pos + 1];
  int interlace = data[r.pos + 4];
  r.pos += 5 + 4;  // rest of IHDR + CRC

  if (depth != 1 && depth != 2 && depth != 4 && depth != 8 && depth != 16)
    return -5;
  if (interlace != 0 && interlace != 1) return -6;
  int channels;
  switch (color) {
    case 0: channels = 1; break;           // gray
    case 2: channels = 3; break;           // rgb
    case 3: channels = 1; break;           // palette
    case 4: channels = 2; break;           // gray+alpha
    case 6: channels = 4; break;           // rgba
    default: return -7;
  }
  if (color == 3 && depth == 16) return -5;
  if ((color == 2 || color >= 4) && depth < 8) return -5;

  std::vector<uint8_t> pal;       // 3*n
  std::vector<uint8_t> trns;      // alpha per palette entry / gray level
  std::vector<uint8_t> idat;

  // Chunk walk.
  while (r.pos + 8 <= r.n) {
    uint32_t clen = r.u32();
    if (r.pos + 4 > r.n) return -2;
    uint32_t type = r.u32();
    if (r.pos + clen + 4 > r.n) return -2;
    const uint8_t* body = data + r.pos;
    if (type == 0x504c5445u) {                       // PLTE
      pal.assign(body, body + clen);
    } else if (type == 0x74524e53u) {                // tRNS
      trns.assign(body, body + clen);
    } else if (type == 0x49444154u) {                // IDAT
      idat.insert(idat.end(), body, body + clen);
    } else if (type == 0x49454e44u) {                // IEND
      break;
    }
    r.pos += clen + 4;                               // body + CRC
  }
  if (idat.empty()) return -8;

  // Inflate.
  int sample_bytes = depth == 16 ? 2 : 1;
  auto pass_bytes = [&](int64_t pw) -> size_t {
    if (depth >= 8) return (size_t)pw * channels * sample_bytes;
    return ((size_t)pw * channels * depth + 7) / 8;
  };
  size_t total = 0;
  if (interlace == 0) {
    total = ((size_t)pass_bytes(w) + 1) * h;
  } else {
    for (int p = 0; p < 7; ++p) {
      int64_t pw = (w - kA7X0[p] + kA7DX[p] - 1) / kA7DX[p];
      int64_t ph = (h - kA7Y0[p] + kA7DY[p] - 1) / kA7DY[p];
      if (pw > 0 && ph > 0) total += (pass_bytes(pw) + 1) * ph;
    }
  }
  std::vector<uint8_t> raw(total);
  {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return -9;
    zs.next_in = idat.data();
    zs.avail_in = (uInt)idat.size();
    zs.next_out = raw.data();
    zs.avail_out = (uInt)raw.size();
    int zr = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (zr != Z_STREAM_END && !(zr == Z_OK && zs.avail_out == 0))
      return -10;
    if (zs.avail_out != 0) return -10;
  }

  int gray_trns = -1;
  if (color == 0 && trns.size() >= 2)
    gray_trns = (trns[0] << 8) | trns[1];

  // Decode one pass's pixel (px, py are pass coords) into RGB8.
  auto emit = [&](const uint8_t* rowdata, int64_t px, int64_t ox,
                  int64_t oy) {
    uint8_t* o = out + 3 * (oy * w + ox);
    if (color == 3) {                                 // palette
      int idx = sample_raw(rowdata, (int)px, depth);
      if (3 * (size_t)idx + 2 >= pal.size()) { o[0] = o[1] = o[2] = 0;
                                               return; }
      int a = (size_t)idx < trns.size() ? trns[idx] : 255;
      o[0] = blend_on_black(pal[3 * idx], a);
      o[1] = blend_on_black(pal[3 * idx + 1], a);
      o[2] = blend_on_black(pal[3 * idx + 2], a);
      return;
    }
    if (depth < 8) {                                  // gray 1/2/4
      int g = scale_gray(sample_raw(rowdata, (int)px, depth), depth);
      if (gray_trns >= 0 &&
          sample_raw(rowdata, (int)px, depth) == gray_trns)
        g = 0;                                        // tRNS -> alpha 0
      o[0] = o[1] = o[2] = (uint8_t)g;
      return;
    }
    const uint8_t* s = rowdata +
        (size_t)px * channels * sample_bytes;
    auto sv = [&](int c) {                            // strip 16 -> high byte
      return (int)s[c * sample_bytes];
    };
    switch (color) {
      case 0: {
        int g = sv(0);
        if (gray_trns >= 0) {
          int full = depth == 16 ? ((s[0] << 8) | s[1]) : s[0];
          if (full == gray_trns) g = 0;
        }
        o[0] = o[1] = o[2] = (uint8_t)g;
        break;
      }
      case 2:
        o[0] = (uint8_t)sv(0); o[1] = (uint8_t)sv(1);
        o[2] = (uint8_t)sv(2);
        break;
      case 4: {
        int a = sv(1);
        uint8_t g = blend_on_black(sv(0), a);
        o[0] = o[1] = o[2] = g;
        break;
      }
      case 6: {
        int a = sv(3);
        o[0] = blend_on_black(sv(0), a);
        o[1] = blend_on_black(sv(1), a);
        o[2] = blend_on_black(sv(2), a);
        break;
      }
    }
  };

  int bpp = depth >= 8 ? channels * sample_bytes : 1;
  size_t off = 0;
  int passes = interlace ? 7 : 1;
  for (int p = 0; p < passes; ++p) {
    int64_t pw = w, ph = h, x0 = 0, y0 = 0, dx = 1, dy = 1;
    if (interlace) {
      x0 = kA7X0[p]; y0 = kA7Y0[p]; dx = kA7DX[p]; dy = kA7DY[p];
      pw = (w - x0 + dx - 1) / dx;
      ph = (h - y0 + dy - 1) / dy;
      if (pw <= 0 || ph <= 0) continue;
    }
    size_t rb = pass_bytes(pw);
    uint8_t* pass_raw = raw.data() + off;
    off += (rb + 1) * ph;
    if (!unfilter(pass_raw, (int)ph, rb, bpp)) return -11;
    for (int64_t y = 0; y < ph; ++y) {
      const uint8_t* rowdata = pass_raw + (size_t)y * (rb + 1) + 1;
      for (int64_t x = 0; x < pw; ++x)
        emit(rowdata, x, x0 + x * dx, y0 + y * dy);
    }
  }
  return 0;
}

}  // extern "C"
