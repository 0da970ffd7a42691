#!/bin/sh
# Build runtime/pjrt_cpu_host against the pip wheel's libtensorflow_cc
# (in-process XLA:CPU PJRT client; see runtime/pjrt_cpu_host.cpp).
# Usage: tools/build_pjrt_host.sh [output-binary]
# Repeat builds hit a source-hash cache (.cxx_build_cache/).
set -e
REPO=$(dirname "$(dirname "$(readlink -f "$0")")")
OUT=${1:-"$REPO/runtime/pjrt_cpu_host"}
SRC="$REPO/runtime/pjrt_cpu_host.cpp"
HASH=$(cat "$SRC" "$0" | sha256sum | cut -c1-16)
CACHE="$REPO/.cxx_build_cache/pjrt_cpu_host-$HASH"
if [ -f "$CACHE" ]; then
  cp "$CACHE" "$OUT"
  echo "built $OUT (cached)"
  exit 0
fi
TFD=$(python -c 'import tensorflow, os; print(os.path.dirname(tensorflow.__file__))')
TFI="$TFD/include"
g++ -std=c++17 -O1 -w -DNDEBUG -D_GLIBCXX_USE_CXX11_ABI=1 -DEIGEN_MAX_ALIGN_BYTES=64 \
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
