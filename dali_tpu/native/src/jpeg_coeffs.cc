// Hybrid JPEG decode, host half: entropy (Huffman/arithmetic) decode ONLY,
// exporting low-frequency DCT coefficients + quantization tables. The IDCT,
// chroma upsampling and color conversion run on the TPU (see
// dali_tpu/kernels/jpeg.py) — the TPU-native analogue of nvJPEG's hybrid
// decoder (reference: SURVEY §2.4 "the hard part": host Huffman → device IDCT;
// BASELINE.json north star).
//
// Supported layout: 3-component YCbCr with 4:2:0 or 4:4:4 sampling (baseline
// or progressive). Caller falls back to full host decode otherwise.

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

extern "C" {

struct CoefErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void coef_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<CoefErr*>(cinfo->err)->jb, 1);
}

// Query geometry: returns 0 and fills blocks-per-component + sampling mode.
// mode: 0 = 4:2:0, 1 = 4:4:4. h/w are the full-resolution image dims.
int dali_tpu_jpeg_coef_info(const char* data, size_t len, int* h, int* w,
                            int* y_bh, int* y_bw, int* c_bh, int* c_bw,
                            int* mode) {
  jpeg_decompress_struct cinfo;
  CoefErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = coef_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  int rc = -2;
  if (cinfo.num_components == 1) {
    // grayscale: treated as 4:4:4 with synthetic ZERO chroma planes —
    // Cb=Cr=128 after IDCT bias makes R=G=B=Y exactly, matching libjpeg's
    // gray->RGB replication bit-for-bit (mode 1 on the wire)
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    *y_bh = (cinfo.image_height + 7) / 8;
    *y_bw = (cinfo.image_width + 7) / 8;
    *c_bh = *y_bh;
    *c_bw = *y_bw;
    *mode = 1;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (cinfo.num_components == 3 && cinfo.jpeg_color_space == JCS_YCbCr) {
    jpeg_component_info* y = &cinfo.comp_info[0];
    jpeg_component_info* cb = &cinfo.comp_info[1];
    jpeg_component_info* cr = &cinfo.comp_info[2];
    bool c420 = y->h_samp_factor == 2 && y->v_samp_factor == 2 &&
                cb->h_samp_factor == 1 && cb->v_samp_factor == 1 &&
                cr->h_samp_factor == 1 && cr->v_samp_factor == 1;
    bool c444 = y->h_samp_factor == 1 && y->v_samp_factor == 1 &&
                cb->h_samp_factor == 1 && cb->v_samp_factor == 1 &&
                cr->h_samp_factor == 1 && cr->v_samp_factor == 1;
    bool c422 = y->h_samp_factor == 2 && y->v_samp_factor == 1 &&
                cb->h_samp_factor == 1 && cb->v_samp_factor == 1 &&
                cr->h_samp_factor == 1 && cr->v_samp_factor == 1;
    // the hybrid wire ships exactly two quant tables (luma + shared chroma);
    // legal-but-rare files with distinct Cb/Cr tables must take the full
    // host decode instead of being silently dequantized with Cb's table
    if ((c420 || c444 || c422) && cb->quant_tbl_no == cr->quant_tbl_no) {
      *h = cinfo.image_height;
      *w = cinfo.image_width;
      // MCU-padded block extents (dummy edge blocks included, like the
      // interleaved scan codes them)
      if (c420) {
        *y_bh = (cinfo.image_height + 15) / 16 * 2;
        *y_bw = (cinfo.image_width + 15) / 16 * 2;
        *c_bh = (cinfo.image_height + 15) / 16;
        *c_bw = (cinfo.image_width + 15) / 16;
        *mode = 0;
      } else if (c422) {  // MCUs are 16x8
        *y_bh = (cinfo.image_height + 7) / 8;
        *y_bw = (cinfo.image_width + 15) / 16 * 2;
        *c_bh = *y_bh;
        *c_bw = (cinfo.image_width + 15) / 16;
        *mode = 2;
      } else {
        *y_bh = (cinfo.image_height + 7) / 8;
        *y_bw = (cinfo.image_width + 7) / 8;
        *c_bh = *y_bh;
        *c_bw = *y_bw;
        *mode = 1;
      }
      rc = 0;
    }
  }
  jpeg_destroy_decompress(&cinfo);
  return rc;
}

// Entropy-decode and export the k x k low-frequency coefficients of every block
// (natural order, row-major within the k x k corner), plus the two quant tables
// (luma, chroma; only the k x k corner, natural order).
//
// y_out:  [y_bh * y_bw * k*k] int16 (row-major blocks)
// cb_out / cr_out: [c_bh * c_bw * k*k] int16
// q_out:  [2 * k*k] uint16
int dali_tpu_jpeg_read_coeffs(const char* data, size_t len, int ky, int kc,
                              short* y_out, short* cb_out, short* cr_out,
                              unsigned short* q_out, int y_bh, int y_bw,
                              int c_bh, int c_bw) {
  jpeg_decompress_struct cinfo;
  CoefErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = coef_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, reinterpret_cast<const unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  // natural-order positions of the k x k low-frequency corner, per plane k
  struct Plane {
    short* out;
    int bh, bw, k;
  } planes[3] = {{y_out, y_bh, y_bw, ky}, {cb_out, c_bh, c_bw, kc}, {cr_out, c_bh, c_bw, kc}};

  // grayscale: Y from the stream, zero chroma + unit chroma quant (the
  // IDCT bias then yields Cb=Cr=128 -> R=G=B=Y exactly)
  const int ncomp_real = cinfo.num_components == 1 ? 1 : 3;
  if (ncomp_real == 1) {
    std::memset(cb_out, 0, sizeof(short) * (size_t)c_bh * c_bw * kc * kc);
    std::memset(cr_out, 0, sizeof(short) * (size_t)c_bh * c_bw * kc * kc);
    for (int i = 0; i < kc * kc; i++) q_out[ky * ky + i] = 1;
  }

  for (int comp = 0; comp < ncomp_real; comp++) {
    jpeg_component_info* ci = &cinfo.comp_info[comp];
    Plane& p = planes[comp];
    const int k = p.k;
    int sel[64];
    for (int r = 0; r < k; r++)
      for (int c = 0; c < k; c++) sel[r * k + c] = r * 8 + c;
    int real_bh = ci->height_in_blocks;
    int real_bw = ci->width_in_blocks;
    for (int br = 0; br < p.bh; br++) {
      JBLOCKARRAY rows = nullptr;
      if (br < real_bh) {
        rows = (cinfo.mem->access_virt_barray)(reinterpret_cast<j_common_ptr>(&cinfo),
                                               coefs[comp], br, 1, FALSE);
      }
      for (int bc = 0; bc < p.bw; bc++) {
        short* dst = p.out + ((long)br * p.bw + bc) * k * k;
        if (rows != nullptr && bc < real_bw) {
          JCOEF* blk = rows[0][bc];
          for (int i = 0; i < k * k; i++) dst[i] = blk[sel[i]];
        } else {
          std::memset(dst, 0, sizeof(short) * k * k);
        }
      }
    }
    // quant tables: luma k*k then chroma k_c*k_c, packed consecutively
    if (comp < 2) {
      JQUANT_TBL* qt = ci->quant_table ? ci->quant_table
                                       : cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
      unsigned short* qdst = comp == 0 ? q_out : q_out + ky * ky;
      for (int i = 0; i < k * k; i++) qdst[i] = qt ? qt->quantval[sel[i]] : 1;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

// Batch header scan on the tasking pool: one Python call fills [n, 7] int32
// (h, w, y_bh, y_bw, c_bh, c_bw, mode); mode = -1 marks unsupported streams.
#include <cstdint>
#include <vector>

extern "C" int64_t dali_tpu_task_submit(void*, void (*)(void*), void*,
                                        const int64_t*, int);
extern "C" void dali_tpu_pool_wait_all(void*);

namespace {
struct InfoJob {
  const char* data;
  size_t len;
  int* out;  // 7 ints
};

void run_info_job(void* p) {
  InfoJob* j = static_cast<InfoJob*>(p);
  int rc = dali_tpu_jpeg_coef_info(j->data, j->len, &j->out[0], &j->out[1],
                                   &j->out[2], &j->out[3], &j->out[4],
                                   &j->out[5], &j->out[6]);
  if (rc != 0) j->out[6] = -1;
}
}  // namespace

extern "C" int dali_tpu_jpeg_coef_info_batch(void* pool, const char** datas,
                                             const size_t* lens, int n,
                                             int* out) {
  std::vector<InfoJob> jobs(n);
  for (int i = 0; i < n; i++) {
    jobs[i] = {datas[i], lens[i], out + 7 * i};
    dali_tpu_task_submit(pool, run_info_job, &jobs[i], nullptr, 0);
  }
  dali_tpu_pool_wait_all(pool);
  return 0;
}
