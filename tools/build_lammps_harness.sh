#!/bin/sh
# Build the LAMMPS pair-style harness: the UNMODIFIED
# sevennet_exp_tpu/lammps_pair/pair_sevennet_tpu.cpp compiled against the mock
# LAMMPS headers (runtime/lammps/mock) and driven by
# runtime/lammps/harness.cpp, linked to libsevenn_exec.so.
# Usage: tools/build_lammps_harness.sh <out_binary> <libsevenn_exec.so>
set -e
OUT=$1
LIB=$2
[ -n "$OUT" ] && [ -n "$LIB" ] || {
  echo "usage: $0 <out_binary> <libsevenn_exec.so>" >&2
  exit 2
}
REPO=$(dirname "$(dirname "$(readlink -f "$0")")")
TFD=$(python -c 'import tensorflow, os; print(os.path.dirname(tensorflow.__file__))')
g++ -std=c++17 -O1 -Wall -Wextra \
  -DLAMMPS_VERSION_NUMBER=20240829 \
  -I"$REPO/runtime/lammps/mock" -I"$REPO/runtime/lammps" -I"$REPO/sevennet_exp_tpu/lammps_pair" \
  -o "$OUT" \
  "$REPO/sevennet_exp_tpu/lammps_pair/pair_sevennet_tpu.cpp" \
  "$REPO/runtime/lammps/harness.cpp" \
  "$LIB" \
  -Wl,-rpath,"$(dirname "$(readlink -f "$LIB")")" -Wl,-rpath,"$TFD"
echo "built $OUT"
