// Benchmark driver for the REFERENCE hot loop (reproject.cpp, compiled
// verbatim from /root/reference — see build.sh). Establishes the CPU
// baseline numbers BASELINE.md mandates, since the reference publishes
// none.
//
// Times the BASELINE.json configs the reference binary can actually run
// (it std::exit()s on equisolid lenses, reproject.cpp:395-398/415-418,
// so configs 2 and 4 are unsupported-by-reference). Single-thread and
// 8-way image-parallel rates are reported; the reference parallelizes
// only ACROSS images (-j thread pool, main.cpp:536-657), never within
// one.
//
// Output: one JSON line per measurement.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "reproject.hpp"

using reproject::Image;
using reproject::LensInfo;

static void rotation_matrix_degrees(float pan, float pitch, float roll,
                                    float *m) {
  // R_y(pan) * (R_x(pitch) * R_z(roll)), degrees -> radians, float32 —
  // matches main.cpp:98-142.
  const float d2r = float(M_PI) / 180.0f;
  float a = pan * d2r, b = pitch * d2r, c = roll * d2r;
  float cy = std::cos(a), sy = std::sin(a);
  float cx = std::cos(b), sx = std::sin(b);
  float cz = std::cos(c), sz = std::sin(c);
  float rx[9] = {1, 0, 0, 0, cx, -sx, 0, sx, cx};
  float rz[9] = {cz, -sz, 0, sz, cz, 0, 0, 0, 1};
  float ry[9] = {cy, 0, sy, 0, 1, 0, -sy, 0, cy};
  float xz[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      xz[i * 3 + j] = 0;
      for (int k = 0; k < 3; ++k)
        xz[i * 3 + j] += rx[i * 3 + k] * rz[k * 3 + j];
    }
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      m[i * 3 + j] = 0;
      for (int k = 0; k < 3; ++k)
        m[i * 3 + j] += ry[i * 3 + k] * xz[k * 3 + j];
    }
}

static Image make_image(LensInfo lens, int w, int h, int ch, unsigned seed) {
  Image img;
  img.lens = lens;
  img.width = w;
  img.height = h;
  img.channels = ch;
  img.data_layout = ch == 4 ? reproject::RGBZ : reproject::RGB;
  img.data = (float *)std::malloc(sizeof(float) * w * h * ch);
  unsigned s = seed;
  for (long i = 0; i < (long)w * h * ch; ++i) {
    s = s * 1664525u + 1013904223u;
    img.data[i] = (s >> 8) * (2.0f / 16777216.0f);
  }
  return img;
}

struct Cfg {
  const char *name;
  LensInfo in_lens, out_lens;
  int in_w, in_h, out_w, out_h, ch;
  reproject::Interpolation interp;
  bool rotated;
  float exposure, reinhard; // 1.0/1.0 = no post_process
};

static double run_once(const Cfg &c, const float *rot) {
  Image in = make_image(c.in_lens, c.in_w, c.in_h, c.ch, 1);
  Image out = make_image(c.out_lens, c.out_w, c.out_h, c.ch, 2);
  auto t0 = std::chrono::steady_clock::now();
  reproject::reproject(&in, &out, 1, c.interp, rot);
  if (c.exposure != 1.0f || c.reinhard != 1.0f)
    reproject::post_process(&out, c.exposure, c.reinhard);
  auto t1 = std::chrono::steady_clock::now();
  // keep the result alive so the loop cannot be elided
  volatile float sink = out.data[0];
  (void)sink;
  std::free(in.data);
  std::free(out.data);
  return std::chrono::duration<double>(t1 - t0).count();
}

int main(int argc, char **argv) {
  int threads = argc > 1 ? std::atoi(argv[1]) : 8;

  LensInfo rect35;
  rect35.type = reproject::RECTILINEAR;
  rect35.rectilinear.focal_length = 35.0f;
  rect35.sensor_width = 36.0f;

  LensInfo equidist;
  equidist.type = reproject::FISHEYE_EQUIDISTANT;
  equidist.fisheye_equidistant.fov = float(M_PI);
  equidist.sensor_width = 36.0f;
  equidist.sensor_height = 36.0f;

  LensInfo equirect;
  equirect.type = reproject::EQUIRECTANGULAR;
  equirect.equirectangular.longitude_min = -float(M_PI);
  equirect.equirectangular.longitude_max = float(M_PI);
  equirect.equirectangular.latitude_min = -float(M_PI) / 2;
  equirect.equirectangular.latitude_max = float(M_PI) / 2;
  equirect.sensor_width = 36.0f;
  equirect.sensor_height = 18.0f;

  LensInfo rect1080 = rect35; // sensor_h = res_y/res_x * sw (main.cpp:27)
  rect1080.sensor_height = 36.0f * 1080.0f / 1920.0f;
  LensInfo rect4k = rect35;
  rect4k.sensor_height = 36.0f * 2160.0f / 3840.0f;

  float rot3[9];
  rotation_matrix_degrees(20.0f, 5.0f, 0.0f, rot3);
  float ident[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};

  Cfg cfgs[] = {
      {"1: 1080p equidist->rect bl", equidist, rect1080, 1080, 1080, 1920,
       1080, 3, reproject::BILINEAR, false, 1.0f, 1.0f},
      {"3: 4K equirect->rect bc+tonemap", equirect, rect4k, 3840, 1920, 3840,
       2160, 3, reproject::BICUBIC, true, 2.0f, 4.0f},
  };

  for (const Cfg &c : cfgs) {
    const float *rot = c.rotated ? rot3 : ident;
    // warmup
    run_once(c, rot);
    // single-thread: median of 5
    std::vector<double> times;
    for (int i = 0; i < 5; ++i)
      times.push_back(run_once(c, rot));
    std::sort(times.begin(), times.end());
    double st = times[times.size() / 2];
    double mpix = c.out_w * (double)c.out_h / 1e6;

    // image-parallel (-j model): N threads, each its own image
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t)
      pool.emplace_back([&c, rot] { run_once(c, rot); });
    for (auto &th : pool)
      th.join();
    double mt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();

    std::printf("{\"config\": \"%s\", \"single_thread_mpix_s\": %.1f, "
                "\"threads\": %d, \"image_parallel_mpix_s\": %.1f}\n",
                c.name, mpix / st, threads, mpix * threads / mt);
  }
  std::printf("{\"config\": \"2: equisolid->equirect rot bl\", "
              "\"unsupported_by_reference\": true, \"why\": \"std::exit on "
              "equisolid, reproject.cpp:395-398\"}\n");
  std::printf("{\"config\": \"4: rect->equisolid RGBZ\", "
              "\"unsupported_by_reference\": true, \"why\": \"std::exit on "
              "equisolid, reproject.cpp:415-418\"}\n");
  std::printf("{\"config\": \"5: directory end-to-end\", "
              "\"unsupported_standalone\": true, \"why\": \"needs the OpenEXR "
              "submodule (not vendored in this environment)\"}\n");
  return 0;
}
