// ir_native — host-side native runtime for the TPU image-retrieval framework.
//
// The reference delegates all native work to third-party engines (PyTorch,
// Milvus, OpenCV; SURVEY §2) and decodes/preprocesses one image at a time in
// Python (reference ImageEmbeddingSystem.py:82-83, app_pipeline.py:111-112).
// This library is the first-party native ingest path feeding the TPU encoder:
//
//   * JPEG decode via libjpeg (+ PNG via libpng), C++ thread pool
//   * fused shortest-side resize -> center crop -> CLIP mean/std normalize
//     producing NHWC float32 ready for the device transfer
//   * a brute-force exact top-k (used as a host-side oracle / CPU fallback
//     for the on-device index)
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <limits>
#include <thread>
#include <type_traits>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

struct ImageU8 {
  std::vector<uint8_t> data;  // HWC, RGB
  int w = 0, h = 0;
  bool ok = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// `min_size`: smallest acceptable shorter side of the DECODED image.
// libjpeg can inverse-transform at M/8 scale (M=1..8) nearly for free —
// IDCT on an 8x8 block at scale M/8 touches only the MxM low-frequency
// coefficients, so decoding a 4000px photo for a 224px model input is
// ~an order of magnitude cheaper than full decode + resize, AND the
// DCT-domain downscale is a proper low-pass (better antialiasing than
// the bilinear it replaces on >2x shrinks). The fused
// resize_crop_normalize finishes the last <=8/7x step. Pass
// min_size<=0 for a full-resolution decode.
ImageU8 decode_jpeg(FILE* f, int min_size) {
  ImageU8 img;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_size > 0) {
    // smallest M/8 (M=1..8) whose shorter OUTPUT side still covers
    // min_size; libjpeg rounds output dims up (ceil)
    unsigned m = 8;
    while (m > 1) {
      const unsigned nw = (cinfo.image_width * (m - 1) + 7) / 8;
      const unsigned nh = (cinfo.image_height * (m - 1) + 7) / 8;
      if (std::min(nw, nh) >= unsigned(min_size)) {
        --m;
      } else {
        break;
      }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.data.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

ImageU8 decode_png(FILE* f) {
  ImageU8 img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray->rgb, bit depth expand
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.data.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.data.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

// min_size: shorter-side floor for DCT-scaled JPEG decode (PNG has no
// scaled-decode path in libpng; it always decodes full resolution).
ImageU8 decode_file(const char* path, int min_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  ImageU8 img;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f, min_size);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

// Shortest-side resize to `size` + center crop. Bilinear with half-pixel
// centers (matches jax.image.resize / PIL bilinear closely; the
// exact-bicubic parity path stays in Python). OutT selects the emit form:
//   float  -> CLIP-normalized f32 (the classic host-complete pipeline)
//   uint8  -> raw RGB bytes; /255 + mean/std run ON DEVICE
//             (models/preprocess.py normalize_u8_device) so the
//             host->device transfer ships 1/4 the bytes and the host
//             skips the normalize pass entirely — on the 1-core ingest
//             host both costs land on the decode core.
template <typename OutT>
void resize_crop_emit(const ImageU8& img, int size, OutT* out) {
  const int w = img.w, h = img.h;
  const float scale = float(std::min(w, h)) / size;
  const int nw = int(std::lround(w / scale));
  const int nh = int(std::lround(h / scale));
  const int left = (nw - size) / 2;
  const int top = (nh - size) / 2;
  for (int oy = 0; oy < size; ++oy) {
    const float sy = (oy + top + 0.5f) * h / nh - 0.5f;
    const int y0 = std::clamp(int(std::floor(sy)), 0, h - 1);
    const int y1 = std::min(y0 + 1, h - 1);
    const float fy = std::clamp(sy - y0, 0.0f, 1.0f);
    for (int ox = 0; ox < size; ++ox) {
      const float sx = (ox + left + 0.5f) * w / nw - 0.5f;
      const int x0 = std::clamp(int(std::floor(sx)), 0, w - 1);
      const int x1 = std::min(x0 + 1, w - 1);
      const float fx = std::clamp(sx - x0, 0.0f, 1.0f);
      for (int c = 0; c < 3; ++c) {
        const float v00 = img.data[(size_t(y0) * w + x0) * 3 + c];
        const float v01 = img.data[(size_t(y0) * w + x1) * 3 + c];
        const float v10 = img.data[(size_t(y1) * w + x0) * 3 + c];
        const float v11 = img.data[(size_t(y1) * w + x1) * 3 + c];
        const float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                        v10 * fy * (1 - fx) + v11 * fy * fx;
        if constexpr (std::is_same_v<OutT, float>) {
          out[(size_t(oy) * size + ox) * 3 + c] =
              (v / 255.0f - kClipMean[c]) / kClipStd[c];
        } else {
          out[(size_t(oy) * size + ox) * 3 + c] = OutT(v + 0.5f);
        }
      }
    }
  }
}

void run_pool(int n_items, int threads, const std::function<void(int)>& work) {
  // Exceptions must never escape a worker: an uncaught exception in a
  // std::thread body calls std::terminate and kills the whole Python
  // process (e.g. bad_alloc from a corrupt JPEG header claiming 65k x 65k).
  // Per-item failures are the caller's status[] contract.
  auto safe = [&](int i) {
    try {
      work(i);
    } catch (...) {
      // work() pre-marks every item failed/zeroed before doing anything
      // that can throw, so an escaping exception leaves a correctly
      // failed item rather than uninitialized output.
    }
  };
  if (threads <= 1) {
    for (int i = 0; i < n_items; ++i) safe(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  const int nt = std::min(threads, n_items);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n_items; i = next.fetch_add(1)) safe(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Decode + preprocess a batch of images.
//   paths:   n C strings
//   size:    output H=W (e.g. 224)
//   out:     n * size * size * 3 float32 (NHWC, CLIP-normalized)
//   status:  n int32 (1 = ok, 0 = failed; failed slots are zero-filled)
//   threads: worker threads (<=1 means inline)
void ir_decode_preprocess_batch(const char** paths, int n, int size, float* out,
                                int32_t* status, int threads) {
  const size_t stride = size_t(size) * size * 3;
  run_pool(n, threads, [&](int i) {
    // Pre-mark failed + zero the slot FIRST: if an exception escapes
    // below (e.g. bad_alloc from a corrupt header claiming 65k x 65k),
    // run_pool's catch leaves whatever is here — and the Python caller
    // allocates status/out with np.empty, so uninitialized memory would
    // otherwise read as "ok" and index garbage pixels.
    status[i] = 0;
    std::memset(out + i * stride, 0, stride * sizeof(float));
    // DCT-scaled decode: land the shorter side at the smallest M/8 scale
    // >= the model input; the fused bilinear below covers the remainder
    ImageU8 img = decode_file(paths[i], size);
    if (!img.ok || img.w <= 0 || img.h <= 0) {
      std::memset(out + i * stride, 0, stride * sizeof(float));
      status[i] = 0;
      return;
    }
    resize_crop_emit<float>(img, size, out + i * stride);
    status[i] = 1;
  });
}

// uint8 variant of ir_decode_preprocess_batch: same decode + shortest-side
// resize + center crop, but emits raw RGB bytes — normalization runs on
// device (models/preprocess.py normalize_u8_device). 1/4 the host->device
// transfer bytes and no host normalize pass; the fp math is identical to
// the f32 path up to the u8 rounding of the bilinear output.
void ir_decode_preprocess_batch_u8(const char** paths, int n, int size,
                                   uint8_t* out, int32_t* status,
                                   int threads) {
  const size_t stride = size_t(size) * size * 3;
  run_pool(n, threads, [&](int i) {
    status[i] = 0;  // see ir_decode_preprocess_batch: escaping exceptions
    std::memset(out + i * stride, 0, stride);
    ImageU8 img = decode_file(paths[i], size);
    if (!img.ok || img.w <= 0 || img.h <= 0) {
      std::memset(out + i * stride, 0, stride);
      status[i] = 0;
      return;
    }
    resize_crop_emit<uint8_t>(img, size, out + i * stride);
    status[i] = 1;
  });
}

// Decode only (RGB uint8 at original size is impractical for batches of
// mixed sizes; this emits a fixed-size bilinear thumbnail for the
// dominant-color stage).
void ir_decode_thumbnail_batch(const char** paths, int n, int size, uint8_t* out,
                               int32_t* status, int threads) {
  const size_t stride = size_t(size) * size * 3;
  run_pool(n, threads, [&](int i) {
    status[i] = 0;  // see ir_decode_preprocess_batch: escaping exceptions
    std::memset(out + i * stride, 0, stride);
    // thumbnails keep >= 2x the output so the plain bilinear below
    // doesn't alias (color stats want the whole frame, lightly filtered)
    ImageU8 img = decode_file(paths[i], 2 * size);
    if (!img.ok) {
      std::memset(out + i * stride, 0, stride);
      status[i] = 0;
      return;
    }
    // plain bilinear to size x size (no crop: color statistics want the
    // whole frame, reference imageProcessing.py:85-99 uses all pixels)
    for (int oy = 0; oy < size; ++oy) {
      const float sy = (oy + 0.5f) * img.h / size - 0.5f;
      const int y0 = std::clamp(int(std::floor(sy)), 0, img.h - 1);
      const int y1 = std::min(y0 + 1, img.h - 1);
      const float fy = std::clamp(sy - y0, 0.0f, 1.0f);
      for (int ox = 0; ox < size; ++ox) {
        const float sx = (ox + 0.5f) * img.w / size - 0.5f;
        const int x0 = std::clamp(int(std::floor(sx)), 0, img.w - 1);
        const int x1 = std::min(x0 + 1, img.w - 1);
        const float fx = std::clamp(sx - x0, 0.0f, 1.0f);
        for (int c = 0; c < 3; ++c) {
          const float v00 = img.data[(size_t(y0) * img.w + x0) * 3 + c];
          const float v01 = img.data[(size_t(y0) * img.w + x1) * 3 + c];
          const float v10 = img.data[(size_t(y1) * img.w + x0) * 3 + c];
          const float v11 = img.data[(size_t(y1) * img.w + x1) * 3 + c];
          out[i * stride + (size_t(oy) * size + ox) * 3 + c] = uint8_t(
              v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
              v10 * fy * (1 - fx) + v11 * fy * fx + 0.5f);
        }
      }
    }
    status[i] = 1;
  });
}

// Exact brute-force cosine top-k (host oracle / CPU fallback for the
// on-device index). gallery is row-major (n, d) unit vectors.
void ir_cosine_topk(const float* query, const float* gallery, int n, int d,
                    int k, float* out_scores, int32_t* out_idx, int threads) {
  float qn = 0.f;
  for (int j = 0; j < d; ++j) qn += query[j] * query[j];
  qn = std::sqrt(qn);
  std::vector<float> scores(n);
  run_pool(n, threads, [&](int i) {
    const float* row = gallery + size_t(i) * d;
    float dot = 0.f;
    for (int j = 0; j < d; ++j) dot += row[j] * query[j];
    scores[i] = qn > 0 ? dot / qn : 0.f;
  });
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  const int kk = std::min(k, n);
  // NaN-safe comparison key: NaN compares false both ways, which violates
  // partial_sort's strict weak ordering (UB); map NaN to -inf (rank last).
  auto key = [&](int i) {
    const float v = scores[i];
    return std::isnan(v) ? -std::numeric_limits<float>::infinity() : v;
  };
  std::partial_sort(idx.begin(), idx.begin() + kk, idx.end(), [&](int a, int b) {
    const float ka = key(a), kb = key(b);
    if (ka != kb) return ka > kb;
    return a < b;  // stable lowest-index tie-break, matching the device index
  });
  for (int i = 0; i < kk; ++i) {
    out_scores[i] = scores[idx[i]];
    out_idx[i] = idx[i];
  }
}

}  // extern "C"
