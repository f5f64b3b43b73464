// Host JPEG decode — the TPU-native analogue of the reference's nvImageCodec
// libjpeg-turbo extension (reference: dali/operators/imgcodec/image_decoder.h
// delegates host decode to libjpeg-turbo; dali/imgcodec decoder impls).
//
// Provides:
//  - header peek (dimensions),
//  - full / DCT-scaled (1/2, 1/4, 1/8) decode to RGB,
//  - decode directly into a strided destination (the padded staging canvas),
//    fusing decode + pad_stack into one pass.
//
// All entry points release the GIL implicitly (no Python API used) and are
// called from the executor's sample thread pool via ctypes.

#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <cstdint>
#include <vector>

#include <jpeglib.h>

extern "C" {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void error_exit_handler(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

static void silent_output(j_common_ptr) {}

int dali_tpu_has_jpeg(void) { return 1; }

// Peek dimensions after applying scale_denom (1 = full size).
int dali_tpu_jpeg_scaled_dims(const char* data, size_t len, int denom, int* h,
                              int* w, int* c) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_calc_output_dimensions(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  *c = 3;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int dali_tpu_decode_jpeg_shape(const char* data, size_t len, int* h, int* w,
                               int* c) {
  return dali_tpu_jpeg_scaled_dims(data, len, 1, h, w, c);
}

// Decode into a strided RGB destination. dst rows are dst_stride bytes apart;
// the decoded image (out_h x out_w x 3) is written top-left; caller guarantees
// the canvas is at least that big. denom in {1, 2, 4, 8}. fancy = fancy chroma
// upsampling (matches libjpeg default; reference uses fancy upsampling too).
int dali_tpu_decode_jpeg_into(const char* data, size_t len, int denom,
                              unsigned char* dst, long dst_stride, int expect_h,
                              int expect_w, int fancy) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
  cinfo.dct_method = JDCT_ISLOW;  // bit-exact with the reference CPU path
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != expect_h || (int)cinfo.output_width != expect_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = dst + (long)cinfo.output_scanline * dst_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int dali_tpu_decode_jpeg(const char* data, size_t len, unsigned char* dst,
                         int h, int w, int fancy) {
  return dali_tpu_decode_jpeg_into(data, len, 1, dst, (long)w * 3, h, w, fancy);
}

// Grayscale decode (output_type GRAY): single channel.
int dali_tpu_decode_jpeg_gray_into(const char* data, size_t len, int denom,
                                   unsigned char* dst, long dst_stride,
                                   int expect_h, int expect_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != expect_h || (int)cinfo.output_width != expect_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = dst + (long)cinfo.output_scanline * dst_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batch decode through the tasking pool (tasking.cc): ONE call from Python per
// batch; per-sample decodes fan out on the native scheduler with no
// interpreter round trips (the reference's thread_pool.h fan-out inside
// nvJPEG/host decoders).

extern "C" int64_t dali_tpu_task_submit(void*, void (*)(void*), void*,
                                        const int64_t*, int);
extern "C" void dali_tpu_pool_wait_all(void*);

namespace {
struct DecodeJob {
  const char* data;
  size_t len;
  int denom;
  unsigned char* dst;
  long stride;
  int h, w, fancy;
  int* ok;
};

void run_decode_job(void* p) {
  DecodeJob* j = static_cast<DecodeJob*>(p);
  *j->ok = dali_tpu_decode_jpeg_into(j->data, j->len, j->denom, j->dst,
                                     j->stride, j->h, j->w, j->fancy) == 0
               ? 1
               : 0;
}
}  // namespace

extern "C" int dali_tpu_decode_jpeg_batch(void* pool, const char** datas,
                                          const size_t* lens, const int* denoms,
                                          unsigned char** dsts,
                                          const long* strides, const int* hs,
                                          const int* ws, int fancy, int n,
                                          int* oks) {
  std::vector<DecodeJob> jobs(n);
  for (int i = 0; i < n; i++) {
    jobs[i] = {datas[i], lens[i], denoms[i], dsts[i],
               strides[i], hs[i],  ws[i],    fancy,  &oks[i]};
    dali_tpu_task_submit(pool, run_decode_job, &jobs[i], nullptr, 0);
  }
  dali_tpu_pool_wait_all(pool);
  return 0;
}
