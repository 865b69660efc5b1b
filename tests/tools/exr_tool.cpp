// Test-only EXR golden generator / reference decoder.
//
// Links the SYSTEM OpenEXR (baked into the image) so the repo's
// dependency-free codec (native/csrc/exr.cc) can be validated against the
// real library on every compression scheme — strictly stronger than the
// roundtrip-only tests that preceded it.  This tool is never part of the
// production build; tests compile it on demand and skip when the library
// is unavailable (tests/test_exr_golden.py).
//
//   exr_tool write    <path> <compression 0..9> <w> <h>  deterministic RGB
//   exr_tool writef   <path> <compression> <w> <h>        FLOAT channels
//   exr_tool writeraw <path> <compression> <w> <h> <bin>  custom float RGB
//   exr_tool writetiled <path> <comp> <w> <h> <tile>      tiled HALF RGBA
//   exr_tool writey   <path> <compression> <w> <h>         Y-only HALF
//   exr_tool dump     <path> <out.bin>                    RGB float32 rows
//
// Pixel pattern: reproducible mix of gradients, a bright disc, and
// pseudo-random texture — exercises flat blocks (B44A), wide dynamic range
// (PIZ/DWA quantization) and negative values.

#include <ImfArray.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfMultiPartOutputFile.h>
#include <ImfOutputFile.h>
#include <ImfOutputPart.h>
#include <ImfPartType.h>
#include <ImfRgba.h>
#include <ImfRgbaFile.h>
#include <ImfTiledRgbaFile.h>
#include <string>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

using namespace Imf;

static float pattern(int x, int y, int w, int h, int c) {
  // Deterministic LCG "texture" plus structure.
  uint32_t s = 2654435761u * (uint32_t)(y * w + x) + 97u * (uint32_t)c + 1u;
  s ^= s >> 13;
  s *= 1274126177u;
  s ^= s >> 16;
  float r = (float)(s & 0xFFFF) / 65535.0f;
  float gx = (float)x / (float)w;
  float gy = (float)y / (float)h;
  float v = 0.1f + 0.8f * (c == 0 ? gx : c == 1 ? gy : 1.0f - gx);
  float dx = gx - 0.7f, dy = gy - 0.3f;
  if (dx * dx + dy * dy < 0.02f) v += 40.0f;  // bright sun disc
  if (y >= h / 2 && y < h / 2 + 4) v = 0.25f; // flat rows (B44A flat blocks)
  if (x == 3 && y == 5) v = -0.5f;            // a negative sample
  return v + 0.05f * r;
}

int main(int argc, char** argv) {
  if (argc < 3) return 2;
  if (!strcmp(argv[1], "write")) {
    if (argc != 6) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    Array2D<Rgba> px(h, w);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        px[y][x].r = pattern(x, y, w, h, 0);
        px[y][x].g = pattern(x, y, w, h, 1);
        px[y][x].b = pattern(x, y, w, h, 2);
        px[y][x].a = 1.0f;
      }
    try {
      RgbaOutputFile f(argv[2], w, h, WRITE_RGBA, 1.0f,
                       Imath::V2f(0, 0), 1.0f, INCREASING_Y,
                       (Compression)comp);
      f.setFrameBuffer(&px[0][0], 1, w);
      f.writePixels(h);
    } catch (const std::exception& e) {
      fprintf(stderr, "write failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "writeraw")) {
    // writeraw <path> <compression> <w> <h> <rgb.bin>: float32 RGB rows.
    if (argc != 7) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    FILE* in = fopen(argv[6], "rb");
    if (!in) return 1;
    Array2D<Rgba> px(h, w);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        float rgb[3];
        if (fread(rgb, sizeof(rgb), 1, in) != 1) return 1;
        px[y][x].r = rgb[0];
        px[y][x].g = rgb[1];
        px[y][x].b = rgb[2];
        px[y][x].a = 1.0f;
      }
    fclose(in);
    try {
      RgbaOutputFile f(argv[2], w, h, WRITE_RGBA, 1.0f, Imath::V2f(0, 0),
                       1.0f, INCREASING_Y, (Compression)comp);
      f.setFrameBuffer(&px[0][0], 1, w);
      f.writePixels(h);
    } catch (const std::exception& e) {
      fprintf(stderr, "writeraw failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "dump")) {
    if (argc != 4) return 2;
    try {
      RgbaInputFile f(argv[2]);
      Imath::Box2i dw = f.dataWindow();
      const int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
      Array2D<Rgba> px(h, w);
      f.setFrameBuffer(&px[0][0] - dw.min.x - dw.min.y * w, 1, w);
      f.readPixels(dw.min.y, dw.max.y);
      FILE* out = fopen(argv[3], "wb");
      if (!out) return 1;
      int32_t dims[2] = {w, h};
      fwrite(dims, sizeof(dims), 1, out);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
          float rgb[3] = {px[y][x].r, px[y][x].g, px[y][x].b};
          fwrite(rgb, sizeof(rgb), 1, out);
        }
      fclose(out);
    } catch (const std::exception& e) {
      fprintf(stderr, "dump failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "writetiled")) {
    // writetiled <path> <compression> <w> <h> <tile> : HALF RGBA tiles.
    if (argc != 7) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    const int ts = atoi(argv[6]);
    Array2D<Rgba> px(h, w);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        px[y][x].r = pattern(x, y, w, h, 0);
        px[y][x].g = pattern(x, y, w, h, 1);
        px[y][x].b = pattern(x, y, w, h, 2);
        px[y][x].a = 1.0f;
      }
    try {
      TiledRgbaOutputFile f(argv[2], w, h, ts, ts, ONE_LEVEL, ROUND_DOWN,
                            WRITE_RGBA, 1.0f, Imath::V2f(0, 0), 1.0f,
                            INCREASING_Y, (Compression)comp);
      f.setFrameBuffer(&px[0][0], 1, w);
      f.writeTiles(0, f.numXTiles() - 1, 0, f.numYTiles() - 1);
    } catch (const std::exception& e) {
      fprintf(stderr, "writetiled failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "writey")) {
    // writey <path> <compression> <w> <h> : a single HALF Y channel.
    if (argc != 6) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    std::vector<half> y(w * h);
    for (int yy = 0; yy < h; ++yy)
      for (int x = 0; x < w; ++x)
        y[yy * w + x] = pattern(x, yy, w, h, 0);
    try {
      Header hd(w, h);
      hd.compression() = (Compression)comp;
      hd.channels().insert("Y", Channel(HALF));
      OutputFile f(argv[2], hd);
      FrameBuffer fb;
      fb.insert("Y", Slice(HALF, (char*)y.data(), 2, 2 * (size_t)w));
      f.setFrameBuffer(fb);
      f.writePixels(h);
    } catch (const std::exception& e) {
      fprintf(stderr, "writey failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "writemp")) {
    // writemp <path> <compression> <w> <h> <nparts>: MULTIPART file of
    // scanlineimage parts; part 0 carries the standard RGB pattern (what
    // the repo decoder must return), later parts a shifted pattern.
    if (argc != 7) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    const int np = atoi(argv[6]);
    try {
      std::vector<Header> hds;
      for (int p = 0; p < np; ++p) {
        Header hd(w, h);
        hd.compression() = (Compression)comp;
        hd.channels().insert("R", Channel(HALF));
        hd.channels().insert("G", Channel(HALF));
        hd.channels().insert("B", Channel(HALF));
        hd.setName(p == 0 ? "beauty" : ("aux" + std::to_string(p)));
        hd.setType(SCANLINEIMAGE);
        hds.push_back(hd);
      }
      MultiPartOutputFile f(argv[2], hds.data(), np);
      for (int p = 0; p < np; ++p) {
        std::vector<half> r(w * h), g(w * h), b(w * h);
        for (int y = 0; y < h; ++y)
          for (int x = 0; x < w; ++x) {
            r[y * w + x] = pattern(x, y, w, h, 0) + p;
            g[y * w + x] = pattern(x, y, w, h, 1) + p;
            b[y * w + x] = pattern(x, y, w, h, 2) + p;
          }
        OutputPart op(f, p);
        FrameBuffer fb;
        fb.insert("R", Slice(HALF, (char*)r.data(), 2, 2 * (size_t)w));
        fb.insert("G", Slice(HALF, (char*)g.data(), 2, 2 * (size_t)w));
        fb.insert("B", Slice(HALF, (char*)b.data(), 2, 2 * (size_t)w));
        op.setFrameBuffer(fb);
        op.writePixels(h);
      }
    } catch (const std::exception& e) {
      fprintf(stderr, "writemp failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  if (!strcmp(argv[1], "writef")) {
    // writef <path> <compression> <w> <h>: FLOAT R/G/B channels through
    // the general-purpose API (exercises FLOAT-typed channel rules).
    if (argc != 6) return 2;
    const int comp = atoi(argv[3]), w = atoi(argv[4]), h = atoi(argv[5]);
    std::vector<float> r(w * h), g(w * h), b(w * h);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        r[y * w + x] = pattern(x, y, w, h, 0);
        g[y * w + x] = pattern(x, y, w, h, 1);
        b[y * w + x] = pattern(x, y, w, h, 2);
      }
    try {
      Header hd(w, h);
      hd.compression() = (Compression)comp;
      hd.channels().insert("R", Channel(FLOAT));
      hd.channels().insert("G", Channel(FLOAT));
      hd.channels().insert("B", Channel(FLOAT));
      OutputFile f(argv[2], hd);
      FrameBuffer fb;
      fb.insert("R", Slice(FLOAT, (char*)r.data(), 4, 4 * (size_t)w));
      fb.insert("G", Slice(FLOAT, (char*)g.data(), 4, 4 * (size_t)w));
      fb.insert("B", Slice(FLOAT, (char*)b.data(), 4, 4 * (size_t)w));
      f.setFrameBuffer(fb);
      f.writePixels(h);
    } catch (const std::exception& e) {
      fprintf(stderr, "writef failed: %s\n", e.what());
      return 1;
    }
    return 0;
  }
  return 2;
}
