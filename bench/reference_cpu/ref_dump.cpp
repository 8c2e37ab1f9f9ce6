// Parity oracle: run the ACTUAL reference hot loop (reproject.cpp,
// compiled verbatim from /root/reference) on a raw float32 image and
// dump the raw result, so tests can compare this framework's output
// against the real C++ — not just the Python transcription in
// tests/reference_port.py.
//
// Usage:
//   ref_dump in.bin out.bin in_lens out_lens in_w in_h out_w out_h ch \
//            interp n_samples pan pitch roll exposure reinhard
// where a lens is one of:
//   rect:<focal>,<sw>,<sh>
//   equidist:<fov>,<sw>,<sh>
//   equirect:<lon0>,<lon1>,<lat0>,<lat1>,<sw>,<sh>
// interp: nn | bl | bc. in.bin/out.bin are raw little-endian float32
// (h, w, ch) row-major.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include "reproject.hpp"

using reproject::Image;
using reproject::LensInfo;

static void rotation_matrix_degrees(float pan, float pitch, float roll,
                                    float *m) {
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

static LensInfo parse_lens(const char *s) {
  LensInfo li;
  std::memset(&li, 0, sizeof(li));
  if (std::strncmp(s, "rect:", 5) == 0) {
    li.type = reproject::RECTILINEAR;
    std::sscanf(s + 5, "%f,%f,%f", &li.rectilinear.focal_length,
                &li.sensor_width, &li.sensor_height);
  } else if (std::strncmp(s, "equidist:", 9) == 0) {
    li.type = reproject::FISHEYE_EQUIDISTANT;
    std::sscanf(s + 9, "%f,%f,%f", &li.fisheye_equidistant.fov,
                &li.sensor_width, &li.sensor_height);
  } else if (std::strncmp(s, "equirect:", 9) == 0) {
    li.type = reproject::EQUIRECTANGULAR;
    std::sscanf(s + 9, "%f,%f,%f,%f,%f,%f", &li.equirectangular.longitude_min,
                &li.equirectangular.longitude_max,
                &li.equirectangular.latitude_min,
                &li.equirectangular.latitude_max, &li.sensor_width,
                &li.sensor_height);
  } else {
    std::fprintf(stderr, "bad lens: %s\n", s);
    std::exit(2);
  }
  return li;
}

int main(int argc, char **argv) {
  if (argc != 17) {
    std::fprintf(stderr, "usage: see header (%d args given)\n", argc);
    return 2;
  }
  const char *in_path = argv[1], *out_path = argv[2];
  LensInfo in_lens = parse_lens(argv[3]);
  LensInfo out_lens = parse_lens(argv[4]);
  int in_w = std::atoi(argv[5]), in_h = std::atoi(argv[6]);
  int out_w = std::atoi(argv[7]), out_h = std::atoi(argv[8]);
  int ch = std::atoi(argv[9]);
  const char *interp_s = argv[10];
  int n_samples = std::atoi(argv[11]);
  float pan = std::atof(argv[12]), pitch = std::atof(argv[13]),
        roll = std::atof(argv[14]);
  float exposure = std::atof(argv[15]), reinhard = std::atof(argv[16]);

  reproject::Interpolation interp = reproject::BILINEAR;
  if (!std::strcmp(interp_s, "nn"))
    interp = reproject::NEAREST;
  else if (!std::strcmp(interp_s, "bc"))
    interp = reproject::BICUBIC;

  Image in;
  in.lens = in_lens;
  in.width = in_w;
  in.height = in_h;
  in.channels = ch;
  in.data_layout = reproject::RGB;
  long n_in = (long)in_w * in_h * ch;
  in.data = (float *)std::malloc(sizeof(float) * n_in);
  FILE *f = std::fopen(in_path, "rb");
  if (!f || (long)std::fread(in.data, sizeof(float), n_in, f) != n_in) {
    std::fprintf(stderr, "read failed: %s\n", in_path);
    return 2;
  }
  std::fclose(f);

  Image out;
  out.lens = out_lens;
  out.width = out_w;
  out.height = out_h;
  out.channels = ch;
  out.data_layout = reproject::RGB;
  out.data = (float *)std::calloc((long)out_w * out_h * ch, sizeof(float));

  float rot[9];
  rotation_matrix_degrees(pan, pitch, roll, rot);
  reproject::reproject(&in, &out, n_samples, interp, rot);
  if (exposure != 1.0f || reinhard != 1.0f)
    reproject::post_process(&out, exposure, reinhard);

  f = std::fopen(out_path, "wb");
  std::fwrite(out.data, sizeof(float), (long)out_w * out_h * ch, f);
  std::fclose(f);
  return 0;
}
