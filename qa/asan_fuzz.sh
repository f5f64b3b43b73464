#!/bin/bash
# Sanitizer gate (reference DALI_ENABLE_SANITIZERS / BUILD_FUZZING): builds
# the native parsers with ASan+UBSan and drives them with a deterministic
# mutation corpus. Any sanitizer report fails the script.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=dali_tpu/native/src
OUT=/tmp/dali_tpu_asan_fuzz
FLAGS="-O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all -std=c++17"
LIBS="-ljpeg -lpthread"
SRCS="$SRC/arena.cc $SRC/jpeg_huff.cc $SRC/jpeg_coeffs_split.cc $SRC/jpeg_encode.cc $SRC/tasking.cc $SRC/sparse_pack.cc"
DEFS=""
if ldconfig -p | grep -q libswresample; then
  SRCS="$SRCS $SRC/audio_decode.cc"
  LIBS="$LIBS -lavformat -lavcodec -lavutil -lswresample"
  DEFS="-DHAVE_AUDIO"
fi
if ldconfig -p | grep -q libswscale; then
  SRCS="$SRCS $SRC/video_decode.cc"
  case "$LIBS" in *-lavformat*) ;; *) LIBS="$LIBS -lavformat -lavcodec -lavutil";; esac
  LIBS="$LIBS -lswscale"
  DEFS="$DEFS -DHAVE_VIDEO"
fi
g++ $FLAGS $DEFS qa/native_fuzz.cc $SRCS -o "$OUT" $LIBS
ASAN_OPTIONS=detect_leaks=1 UBSAN_OPTIONS=print_stacktrace=1 "$OUT"
