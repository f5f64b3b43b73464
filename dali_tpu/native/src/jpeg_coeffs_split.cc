// Split-precision coefficient export for the hybrid JPEG decoder wire format:
// DC terms as int16 (differentially-coded DC has a wide range), AC terms
// saturated to int8 (quantized AC magnitudes are small by design of the quant
// tables; saturation is a no-op for typical photographic content at q<=95).
// Halves host→device traffic vs int16 planes — the wire is the bottleneck on
// bandwidth-constrained hosts.

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

extern "C" {

struct SplitErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void split_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<SplitErr*>(cinfo->err)->jb, 1);
}

static inline signed char sat8(int v) {
  return (signed char)(v < -128 ? -128 : v > 127 ? 127 : v);
}

// dc_out: per-plane [bh*bw] int16; ac_out: [bh*bw*(k*k-1)] int8.
// q_out layout matches jpeg_coeffs.cc: luma ky*ky then chroma kc*kc entries.
int dali_tpu_jpeg_read_coeffs_split(const char* data, size_t len, int ky, int kc,
                                    short* y_dc, signed char* y_ac,
                                    short* cb_dc, signed char* cb_ac,
                                    short* cr_dc, signed char* cr_ac,
                                    unsigned short* q_out, int y_bh, int y_bw,
                                    int c_bh, int c_bw) {
  jpeg_decompress_struct cinfo;
  SplitErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = split_error_exit;
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
  struct Plane {
    short* dc;
    signed char* ac;
    int bh, bw, k;
  } planes[3] = {{y_dc, y_ac, y_bh, y_bw, ky},
                 {cb_dc, cb_ac, c_bh, c_bw, kc},
                 {cr_dc, cr_ac, c_bh, c_bw, kc}};

  for (int comp = 0; comp < 3; comp++) {
    jpeg_component_info* ci = &cinfo.comp_info[comp];
    Plane& p = planes[comp];
    const int k = p.k;
    const int n_ac = k * k - 1;
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
        long bidx = (long)br * p.bw + bc;
        signed char* ac_dst = p.ac + bidx * n_ac;
        if (rows != nullptr && bc < real_bw) {
          JCOEF* blk = rows[0][bc];
          p.dc[bidx] = blk[0];
          for (int i = 1; i < k * k; i++) ac_dst[i - 1] = sat8(blk[sel[i]]);
        } else {
          p.dc[bidx] = 0;
          std::memset(ac_dst, 0, n_ac);
        }
      }
    }
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
