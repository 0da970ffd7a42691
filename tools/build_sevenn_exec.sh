#!/bin/sh
# Build libsevenn_exec.so (embeddable C API around in-process PJRT
# execution of a deployed artifact; runtime/sevenn_exec.cpp).
# Usage: tools/build_sevenn_exec.sh [output.so]
# Repeat builds hit a source-hash cache (.cxx_build_cache/): the TF-
# wheel link takes ~2 min and dominated the test suite's wall time.
set -e
REPO=$(dirname "$(dirname "$(readlink -f "$0")")")
OUT=${1:-"$REPO/runtime/libsevenn_exec.so"}
SRC="$REPO/runtime/sevenn_exec.cpp"
HASH=$(cat "$SRC" "$0" | sha256sum | cut -c1-16)
CACHE="$REPO/.cxx_build_cache/libsevenn_exec-$HASH.so"
if [ -f "$CACHE" ]; then
  cp "$CACHE" "$OUT"
  echo "built $OUT (cached)"
  exit 0
fi
TFD=$(python -c 'import tensorflow, os; print(os.path.dirname(tensorflow.__file__))')
TFI="$TFD/include"
# flag notes: -DNDEBUG + the wheel's ABI defines are REQUIRED (see
# runtime/README.md - struct layouts differ otherwise and Execute
# segfaults)
g++ -std=c++17 -O1 -w -fPIC -shared \
  -DNDEBUG -D_GLIBCXX_USE_CXX11_ABI=1 -DEIGEN_MAX_ALIGN_BYTES=64 \
  -I"$REPO/runtime/mlir_stub" \
  -I"$TFI" \
  -I"$TFI/external/highwayhash" \
  -I"$TFI/external/farmhash_archive/src" \
  -o "$OUT" "$SRC" \
  "$TFD/libtensorflow_cc.so.2" "$TFD/libtensorflow_framework.so.2" \
  -Wl,-rpath,"$TFD"
mkdir -p "$REPO/.cxx_build_cache"
cp "$OUT" "$CACHE"
echo "built $OUT"
