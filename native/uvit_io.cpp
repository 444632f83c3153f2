// Native host-side data-loader runtime for uncertainty_vit_tpu.
//
// The reference delegates its host data path to torch DataLoader workers
// (PIL decode in forked processes, run_cyclical.py:474-494). This module is
// the TPU-native equivalent: a GIL-free C++ pipeline that decodes JPEGs
// (libjpeg), resizes shorter-side + center-crops to the canonical device
// canvas, and assembles contiguous uint8 batches with a std::thread pool.
// Python binds via ctypes (utils/native.py); PIL remains the fallback for
// non-JPEG formats.
//
// Build: g++ -O3 -fPIC -shared -o libuvit_io.so uvit_io.cpp -ljpeg -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <functional>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory into an RGB buffer (caller frees via returned
// vector). Returns false on corrupt input.
bool decode_jpeg_mem(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                     int* height, int* width) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  out->resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *height = h;
  *width = w;
  return true;
}

// Antialiased separable triangle-filter resize (PIL BILINEAR semantics:
// filter support scales with the downscale factor).
struct Taps {
  std::vector<int> start;     // first source index per output index
  std::vector<int> count;     // taps per output index
  std::vector<float> weight;  // flattened [out, max_count] weights
  int max_count;
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double support = std::max(scale, 1.0);
  t.max_count = static_cast<int>(std::ceil(support * 2.0)) + 2;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(static_cast<size_t>(out_size) * t.max_count, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(center - support + 0.5));
    int hi = std::min(in_size, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    for (int i = lo; i < hi; ++i) {
      double d = (i + 0.5 - center) / support;
      double wgt = std::max(0.0, 1.0 - std::abs(d));
      t.weight[static_cast<size_t>(o) * t.max_count + (i - lo)] =
          static_cast<float>(wgt);
      total += wgt;
    }
    if (total > 0) {
      for (int i = lo; i < hi; ++i)
        t.weight[static_cast<size_t>(o) * t.max_count + (i - lo)] /= total;
    }
    t.start[o] = lo;
    t.count[o] = hi - lo;
  }
  return t;
}

void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int nh,
                     int nw) {
  const Taps ty = make_taps(h, nh);
  const Taps tx = make_taps(w, nw);
  // rows pass: [h, w, 3] → [h, nw, 3] in float
  std::vector<float> tmp(static_cast<size_t>(h) * nw * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* orow = tmp.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      float acc[3] = {0, 0, 0};
      const float* wgt = tx.weight.data() + static_cast<size_t>(x) * tx.max_count;
      for (int k = 0; k < tx.count[x]; ++k) {
        const uint8_t* px = row + (static_cast<size_t>(tx.start[x]) + k) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += wgt[k] * px[c];
      }
      for (int c = 0; c < 3; ++c) orow[x * 3 + c] = acc[c];
    }
  }
  // cols pass: [h, nw, 3] → [nh, nw, 3] into uint8
  for (int y = 0; y < nh; ++y) {
    const float* wgt = ty.weight.data() + static_cast<size_t>(y) * ty.max_count;
    uint8_t* orow = dst + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.count[y]; ++k) {
        const float* px = tmp.data() +
            ((static_cast<size_t>(ty.start[y]) + k) * nw + x) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += wgt[k] * px[c];
      }
      for (int c = 0; c < 3; ++c)
        orow[x * 3 + c] = static_cast<uint8_t>(
            std::max(0.0f, std::min(acc[c] + 0.5f, 255.0f)));
    }
  }
}

// Decode one file → shorter-side resize to `size` → center crop size×size,
// written into out (size*size*3 bytes). Returns 0 ok, nonzero on failure.
int decode_one_to_canvas(const char* path, int size, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return 2;
  }
  std::vector<uint8_t> raw(len);
  size_t got = fread(raw.data(), 1, len, f);
  fclose(f);
  if (got != static_cast<size_t>(len)) return 3;

  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg_mem(raw.data(), raw.size(), &rgb, &h, &w)) return 4;

  int nh, nw;
  if (w <= h) {
    nw = size;
    nh = std::max(size, static_cast<int>(std::lround(
                            static_cast<double>(size) * h / w)));
  } else {
    nh = size;
    nw = std::max(size, static_cast<int>(std::lround(
                            static_cast<double>(size) * w / h)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear(rgb.data(), h, w, resized.data(), nh, nw);

  const int top = (nh - size) / 2;
  const int left = (nw - size) / 2;
  for (int y = 0; y < size; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * size * 3,
                resized.data() + ((static_cast<size_t>(top) + y) * nw + left) * 3,
                static_cast<size_t>(size) * 3);
  }
  return 0;
}

// Decode one file → shorter-side resize to `short_size`, longer side capped
// at `canvas` (center-cropping only the extreme-aspect excess) → paste at
// the top-left of a zeroed canvas×canvas square. Writes the valid extent to
// valid_hw[0..1]. The square center-crop variant above always discards the
// long-side margins BEFORE augmentation; this letterboxed form preserves
// them so the device RandomResizedCrop samples the full image like the
// reference's torchvision RRC (datasets.py:221-239).
int decode_one_letterbox(const char* path, int short_size, int canvas,
                         uint8_t* out, int32_t* valid_hw) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return 2;
  }
  std::vector<uint8_t> raw(len);
  size_t got = fread(raw.data(), 1, len, f);
  fclose(f);
  if (got != static_cast<size_t>(len)) return 3;

  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg_mem(raw.data(), raw.size(), &rgb, &h, &w)) return 4;

  int nh, nw;
  if (w <= h) {
    nw = short_size;
    nh = std::max(short_size, static_cast<int>(std::lround(
                                  static_cast<double>(short_size) * h / w)));
  } else {
    nh = short_size;
    nw = std::max(short_size, static_cast<int>(std::lround(
                                  static_cast<double>(short_size) * w / h)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear(rgb.data(), h, w, resized.data(), nh, nw);

  const int ch = std::min(nh, canvas);
  const int cw = std::min(nw, canvas);
  const int top = (nh - ch) / 2;
  const int left = (nw - cw) / 2;
  std::memset(out, 0, static_cast<size_t>(canvas) * canvas * 3);
  for (int y = 0; y < ch; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * canvas * 3,
                resized.data() + ((static_cast<size_t>(top) + y) * nw + left) * 3,
                static_cast<size_t>(cw) * 3);
  }
  valid_hw[0] = ch;
  valid_hw[1] = cw;
  return 0;
}

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  num_threads = std::max(1, std::min(num_threads, n));
  if (num_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode a batch of JPEG files into a contiguous [n, size, size, 3] uint8
// buffer. statuses[i] != 0 marks a failed decode (caller resamples, matching
// dataset_folder.py:164-171 tolerance). Releases no Python state — call
// without the GIL via ctypes.
void uvit_decode_batch(const char** paths, int n, int size, uint8_t* out,
                       int* statuses, int num_threads) {
  const size_t item = static_cast<size_t>(size) * size * 3;
  parallel_for(n, num_threads, [&](int i) {
    statuses[i] = decode_one_to_canvas(paths[i], size, out + item * i);
  });
}

// Letterboxed batch decode: [n, canvas, canvas, 3] zero-filled squares with
// per-image valid extents in valid_hw [n, 2] (see decode_one_letterbox).
void uvit_decode_batch_letterbox(const char** paths, int n, int short_size,
                                 int canvas, uint8_t* out, int32_t* valid_hw,
                                 int* statuses, int num_threads) {
  const size_t item = static_cast<size_t>(canvas) * canvas * 3;
  parallel_for(n, num_threads, [&](int i) {
    statuses[i] = decode_one_letterbox(paths[i], short_size, canvas,
                                       out + item * i, valid_hw + 2 * i);
  });
}

// Parallel gather of n equally-sized items into one contiguous batch buffer.
void uvit_assemble_batch(const uint8_t** srcs, int n, int64_t item_bytes,
                         uint8_t* out, int num_threads) {
  parallel_for(n, num_threads, [&](int i) {
    std::memcpy(out + item_bytes * i, srcs[i], item_bytes);
  });
}

int uvit_io_version() { return 2; }

}  // extern "C"
