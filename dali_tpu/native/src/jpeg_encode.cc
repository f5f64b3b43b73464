// JPEG encode via libjpeg. Primary use: generating test fixtures whose
// features (restart intervals, 4:4:4 / 4:2:0 sampling, progressive scans)
// Python-side encoders cannot all produce, so the fast Huffman decoder
// (jpeg_huff.cc) can be parity-tested against the libjpeg coefficient path.
// Also backs the ImageEncoder host op (reference: dali/imgcodec encode API).

#include <csetjmp>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>

extern "C" {

namespace {
struct EncErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void enc_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<EncErr*>(cinfo->err)->jb, 1);
}
}  // namespace

// Encode interleaved RGB (HWC uint8) to JPEG. subsamp: 0 = 4:2:0, 1 = 4:4:4,
// 2 = 4:2:2.
// restart_interval in MCUs (0 = none). progressive: nonzero = multi-scan.
// Returns the encoded byte count, or -1 on error / insufficient out_cap.
long dali_tpu_jpeg_encode_rgb(const unsigned char* rgb, int h, int w,
                              int quality, int subsamp, int restart_interval,
                              int progressive, unsigned char* out,
                              long out_cap) {
  jpeg_compress_struct cinfo;
  EncErr jerr;
  unsigned char* buf = nullptr;
  unsigned long buf_len = 0;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = enc_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    if (buf) free(buf);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buf_len);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (subsamp == 1) {
    for (int i = 0; i < 3; i++) {
      cinfo.comp_info[i].h_samp_factor = 1;
      cinfo.comp_info[i].v_samp_factor = 1;
    }
  } else if (subsamp == 2) {
    cinfo.comp_info[0].h_samp_factor = 2;
    cinfo.comp_info[0].v_samp_factor = 1;
    for (int i = 1; i < 3; i++) {
      cinfo.comp_info[i].h_samp_factor = 1;
      cinfo.comp_info[i].v_samp_factor = 1;
    }
  } else {
    cinfo.comp_info[0].h_samp_factor = 2;
    cinfo.comp_info[0].v_samp_factor = 2;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }
  cinfo.restart_interval = restart_interval;
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<JSAMPROW>(rgb + (size_t)cinfo.next_scanline * w * 3);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long n = (long)buf_len;
  if (n > out_cap) {
    free(buf);
    return -1;
  }
  std::memcpy(out, buf, n);
  free(buf);
  return n;
}

}  // extern "C"
