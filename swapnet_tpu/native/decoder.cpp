// Native host-side decode kernels for the input pipeline.
//
// TPU-native counterpart of the C++ machinery the reference leans on for
// data loading (torch DataLoader workers + scipy.sparse codecs,
// reference datasets/__init__.py:69-74, datasets/data_utils.py:298-343).
// The hot host ops — JPEG/PNG decode fused with PIL-compatible bilinear
// resize, CSC sparse -> dense label expansion fused with nearest resize —
// are implemented here and loaded via ctypes (swapnet_tpu/data/native.py)
// with PIL/numpy fallbacks when the shared library is unavailable.
//
// Build: g++ -O3 -shared -fPIC decoder.cpp -o libswapnet_native.so \
//            [-DSWAPNET_WITH_IMAGE -ljpeg -lpng]   (see data/native.py)

#include <cstdint>
#include <cstring>

extern "C" {

// CSC (scipy csc_matrix) -> dense uint8 label map, row-major (H, W).
// data may be float32/float64 in scipy files; values are label ids.
void csc_to_dense_u8(
    const double* data, const int32_t* indices, const int32_t* indptr,
    int32_t rows, int32_t cols, uint8_t* out /* rows*cols, pre-zeroed or not */) {
  std::memset(out, 0, (size_t)rows * cols);
  for (int32_t j = 0; j < cols; ++j) {
    for (int32_t p = indptr[j]; p < indptr[j + 1]; ++p) {
      out[(size_t)indices[p] * cols + j] = (uint8_t)data[p];
    }
  }
}

// CSC -> dense fused with nearest resize to (out_h, out_w) using torch
// F.interpolate semantics: src = dst * in / out.  One pass, no full-size
// intermediate: expand into a scratch row-selector free layout.
void csc_to_dense_resized_u8(
    const double* data, const int32_t* indices, const int32_t* indptr,
    int32_t rows, int32_t cols, int32_t out_h, int32_t out_w,
    uint8_t* scratch /* rows*cols */, uint8_t* out /* out_h*out_w */) {
  csc_to_dense_u8(data, indices, indptr, rows, cols, scratch);
  for (int32_t r = 0; r < out_h; ++r) {
    const uint8_t* src_row = scratch + (size_t)((int64_t)r * rows / out_h) * cols;
    uint8_t* dst_row = out + (size_t)r * out_w;
    for (int32_t c = 0; c < out_w; ++c) {
      dst_row[c] = src_row[(int64_t)c * cols / out_w];
    }
  }
}

// Nearest resize of a uint8 label map (torch floor convention).
void resize_labels_nearest_u8(
    const uint8_t* src, int32_t h, int32_t w,
    uint8_t* dst, int32_t out_h, int32_t out_w) {
  for (int32_t r = 0; r < out_h; ++r) {
    const uint8_t* src_row = src + (size_t)((int64_t)r * h / out_h) * w;
    uint8_t* dst_row = dst + (size_t)r * out_w;
    for (int32_t c = 0; c < out_w; ++c) {
      dst_row[c] = src_row[(int64_t)c * w / out_w];
    }
  }
}

// Dense uint8 label map -> CSC arrays (for compress_and_save_cloth).
// Returns nnz; caller allocates worst-case buffers (rows*cols).
int64_t dense_u8_to_csc(
    const uint8_t* labels, int32_t rows, int32_t cols,
    double* data, int32_t* indices, int32_t* indptr /* cols+1 */) {
  int64_t nnz = 0;
  indptr[0] = 0;
  for (int32_t j = 0; j < cols; ++j) {
    for (int32_t i = 0; i < rows; ++i) {
      uint8_t v = labels[(size_t)i * cols + j];
      if (v != 0) {
        data[nnz] = (double)v;
        indices[nnz] = i;
        ++nnz;
      }
    }
    indptr[j + 1] = (int32_t)nnz;
  }
  return nnz;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Image decode + resize (compiled only when -DSWAPNET_WITH_IMAGE: needs
// libjpeg + libpng headers; data/native.py probes and falls back to a
// decode-free build, in which case Python uses PIL).
// ---------------------------------------------------------------------------
#ifdef SWAPNET_WITH_IMAGE

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <thread>
#include <vector>

namespace {

struct JErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JErr*>(cinfo->err)->jb, 1);
}

// Decode a JPEG from memory into an RGB buffer.  When draft_min > 0,
// libjpeg's DCT scaling decodes at the smallest 1/1..1/8 scale whose
// dimensions stay >= draft_min (PIL Image.draft analog) — for the common
// load-big/resize-small pipeline this skips most of the IDCT work.
bool decode_jpeg_rgb(const uint8_t* buf, int64_t len, int32_t draft_min,
                     std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // handles grayscale + YCbCr sources
  if (draft_min > 0) {
    cinfo.scale_num = 1;
    for (int denom = 8; denom >= 1; denom >>= 1) {
      if ((int)cinfo.image_width / denom >= draft_min &&
          (int)cinfo.image_height / denom >= draft_min) {
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {  // e.g. CMYK: let PIL handle it
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize((size_t)*w * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + (size_t)cinfo.output_scanline * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png_rgb(const uint8_t* buf, int64_t len,
                    std::vector<uint8_t>* out, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)len)) return false;
  image.format = PNG_FORMAT_RGB;
  *w = image.width;
  *h = image.height;
  out->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// PIL-compatible separable triangle (bilinear-with-antialias) resample of
// interleaved RGB, matching Pillow's ImagingResample for Image.BILINEAR:
// support widens by the scale factor on downscale, so this is NOT the
// 2x2-tap GPU "bilinear".  Float accumulation (PIL uses 8-bit fixed point;
// agreement is within ±1/255, asserted in tests/test_native_decode.py).
// Weights are precomputed per output position; both passes run row-major.
struct ResampleTaps {
  std::vector<int> xmin, count;
  std::vector<float> w;  // out_len x ksize, normalized
  int ksize = 0;
};

ResampleTaps triangle_taps(int in_len, int out_len) {
  ResampleTaps t;
  const double scale = (double)in_len / out_len;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = filterscale;  // triangle filter support = 1.0
  t.ksize = (int)std::ceil(support) * 2 + 1;
  t.xmin.resize(out_len);
  t.count.resize(out_len);
  t.w.assign((size_t)out_len * t.ksize, 0.0f);
  for (int xx = 0; xx < out_len; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = (int)std::max(0.0, std::floor(center - support));
    int xmax = (int)std::min((double)in_len, std::ceil(center + support));
    double total = 0.0;
    float* w = &t.w[(size_t)xx * t.ksize];
    for (int k = xmin; k < xmax; ++k) {
      double x = (k + 0.5 - center) / filterscale;
      double v = x < 0 ? 1.0 + x : 1.0 - x;
      w[k - xmin] = v > 0 ? (float)v : 0.0f;
      total += w[k - xmin];
    }
    for (int k = 0; k < xmax - xmin; ++k) w[k] = (float)(w[k] / total);
    t.xmin[xx] = xmin;
    t.count[xx] = xmax - xmin;
  }
  return t;
}

void resize_rgb_pil(const uint8_t* src, int h, int w, int out_size,
                    uint8_t* out) {
  const ResampleTaps tx = triangle_taps(w, out_size);
  const ResampleTaps ty = triangle_taps(h, out_size);
  // horizontal: (h, w, 3) u8 -> (h, out, 3) f32, row-major
  std::vector<float> tmp((size_t)h * out_size * 3);
  for (int r = 0; r < h; ++r) {
    const uint8_t* srow = src + (size_t)r * w * 3;
    float* drow = tmp.data() + (size_t)r * out_size * 3;
    for (int xx = 0; xx < out_size; ++xx) {
      const float* wt = &tx.w[(size_t)xx * tx.ksize];
      const uint8_t* s = srow + (size_t)tx.xmin[xx] * 3;
      float a0 = 0, a1 = 0, a2 = 0;
      for (int k = 0; k < tx.count[xx]; ++k, s += 3) {
        a0 += wt[k] * s[0];
        a1 += wt[k] * s[1];
        a2 += wt[k] * s[2];
      }
      drow[xx * 3 + 0] = a0;
      drow[xx * 3 + 1] = a1;
      drow[xx * 3 + 2] = a2;
    }
  }
  // vertical: (h, out, 3) -> (out, out, 3); inner loop contiguous in cols
  const int rowlen = out_size * 3;
  std::vector<float> acc(rowlen);
  for (int yy = 0; yy < out_size; ++yy) {
    const float* wt = &ty.w[(size_t)yy * ty.ksize];
    std::fill(acc.begin(), acc.end(), 0.0f);
    for (int k = 0; k < ty.count[yy]; ++k) {
      const float* srow = tmp.data() + (size_t)(ty.xmin[yy] + k) * rowlen;
      const float wk = wt[k];
      for (int c = 0; c < rowlen; ++c) acc[c] += wk * srow[c];
    }
    uint8_t* drow = out + (size_t)yy * rowlen;
    for (int c = 0; c < rowlen; ++c) {
      float v = std::round(acc[c]);
      drow[c] = (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : v);
    }
  }
}

int decode_one(const uint8_t* buf, int64_t len, int32_t out_size,
               int32_t jpeg_draft, uint8_t* out, int32_t* orig_wh) {
  if (len < 8) return 1;
  std::vector<uint8_t> pix;
  int w = 0, h = 0;
  bool ok = false;
  if (buf[0] == 0xFF && buf[1] == 0xD8) {
    ok = decode_jpeg_rgb(buf, len, jpeg_draft ? out_size : 0, &pix, &w, &h);
    if (ok && jpeg_draft && orig_wh) {
      // draft decode reports scaled dims; re-read the header for originals
      // only when the caller asked for them (ROI scaling needs pre-resize
      // width).  Cheap: header parse only.
      jpeg_decompress_struct ci;
      JErr je;
      ci.err = jpeg_std_error(&je.pub);
      je.pub.error_exit = jerr_exit;
      if (!setjmp(je.jb)) {
        jpeg_create_decompress(&ci);
        jpeg_mem_src(&ci, const_cast<uint8_t*>(buf), (unsigned long)len);
        jpeg_read_header(&ci, TRUE);
        orig_wh[0] = ci.image_width;
        orig_wh[1] = ci.image_height;
        jpeg_destroy_decompress(&ci);
        orig_wh = nullptr;  // filled
      } else {
        // header re-read failed: without original dims the tail code would
        // report DCT-scaled dims and silently skew ROI scaling — force the
        // PIL fallback for this item instead.
        jpeg_destroy_decompress(&ci);
        return 1;
      }
    }
  } else if (buf[0] == 0x89 && buf[1] == 'P') {
    ok = decode_png_rgb(buf, len, &pix, &w, &h);
  }
  if (!ok) return 1;
  if (orig_wh) {
    orig_wh[0] = w;
    orig_wh[1] = h;
  }
  if (w == out_size && h == out_size) {
    std::memcpy(out, pix.data(), pix.size());
  } else {
    resize_rgb_pil(pix.data(), h, w, out_size, out);
  }
  return 0;
}

}  // namespace

extern "C" {

int32_t swapnet_has_image_decode(void) { return 1; }

// Decode one JPEG/PNG byte buffer -> (out_size, out_size, 3) uint8 RGB with
// PIL-Resize-compatible bilinear.  jpeg_draft != 0 enables DCT-scaled
// decode (faster, numerics differ slightly from full decode + resize).
// orig_wh (2 x int32, may be null) receives the pre-resize dimensions.
// Returns 0 on success, nonzero if the file needs the PIL fallback.
int32_t decode_rgb_resize_u8(const uint8_t* buf, int64_t len,
                             int32_t out_size, int32_t jpeg_draft,
                             uint8_t* out, int32_t* orig_wh) {
  return decode_one(buf, len, out_size, jpeg_draft, out, orig_wh);
}

// Threaded batch decode: bufs is one concatenated byte blob with offsets
// (n+1 entries); out is (n, out_size, out_size, 3).  Per-item status in
// statuses (0 = ok).  orig_whs (n x 2 int32, may be null) receives each
// item's pre-resize dimensions (ROI scaling needs the original width).
// The DataLoader-worker analog: real C++ threads, no GIL — Python hands
// over the whole IO batch in one call.
void decode_rgb_resize_batch_u8(const uint8_t* blob, const int64_t* offsets,
                                int32_t n, int32_t out_size,
                                int32_t jpeg_draft, int32_t nthreads,
                                uint8_t* out, int32_t* statuses,
                                int32_t* orig_whs) {
  const size_t item = (size_t)out_size * out_size * 3;
  nthreads = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> pool;
  std::atomic<int32_t> next(0);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&]() {
      for (int32_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        statuses[i] = decode_one(blob + offsets[i], offsets[i + 1] - offsets[i],
                                 out_size, jpeg_draft, out + (size_t)i * item,
                                 orig_whs ? orig_whs + (size_t)i * 2 : nullptr);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"

#else  // !SWAPNET_WITH_IMAGE

extern "C" {
int32_t swapnet_has_image_decode(void) { return 0; }
}

#endif  // SWAPNET_WITH_IMAGE
