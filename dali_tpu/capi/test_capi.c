/* C API smoke test: build a pipeline from serialized JSON, run, copy a sample. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "dali_tpu.h"

int main(int argc, char** argv) {
  if (argc != 2) { fprintf(stderr, "usage: %s <serialized.json>\n", argv[0]); return 2; }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  char* payload = malloc(n);
  fread(payload, 1, n, f); fclose(f);

  if (daliTpuInit() != DALI_TPU_OK) { fprintf(stderr, "init: %s\n", daliTpuGetLastError()); return 1; }
  daliTpuPipeline p;
  if (daliTpuCreatePipeline(&p, payload, n) != DALI_TPU_OK) {
    fprintf(stderr, "create: %s\n", daliTpuGetLastError()); return 1;
  }
  if (daliTpuRun(p) != DALI_TPU_OK) { fprintf(stderr, "run: %s\n", daliTpuGetLastError()); return 1; }
  int count, bs;
  daliTpuOutputCount(p, &count);
  daliTpuBatchSize(p, &bs);
  printf("outputs=%d batch=%d\n", count, bs);
  daliTpuTensorInfo info;
  if (daliTpuOutputInfo(p, 0, 0, &info) != DALI_TPU_OK) {
    fprintf(stderr, "info: %s\n", daliTpuGetLastError()); return 1;
  }
  printf("sample0: ndim=%lld nbytes=%lld shape=[", (long long)info.ndim, (long long)info.nbytes);
  for (int i = 0; i < info.ndim; i++) printf("%lld%s", (long long)info.shape[i], i + 1 < info.ndim ? "," : "");
  printf("]\n");
  void* buf = malloc(info.nbytes);
  if (daliTpuCopyOutputSample(p, 0, 0, buf, info.nbytes) != DALI_TPU_OK) {
    fprintf(stderr, "copy: %s\n", daliTpuGetLastError()); return 1;
  }
  float first; memcpy(&first, buf, sizeof(float));
  printf("first float: %f\n", first);
  /* error-path probe: bad sample index must fail cleanly */
  if (daliTpuOutputInfo(p, 0, 9999, &info) == DALI_TPU_OK) {
    fprintf(stderr, "expected error for bad sample index\n"); return 1;
  }
  printf("bad-index error: %s\n", daliTpuGetLastError());
  daliTpuDestroyPipeline(p);
  printf("C API OK\n");
  return 0;
}
