#!/bin/sh
# Build the golden C++ reference (read-only at /root/reference) out-of-tree
# for parity testing. The reference vendors eigen/Sophus/CLI11/phmap as git
# submodules that are NOT checked out in this container, so we inject:
#   * Eigen from tensorflow's bundled headers (full upstream Eigen),
#   * thin standard-semantics shims for Sophus / CLI11 / phmap
#     (parity/refshim/ — see each header for the exact surface covered).
# Usage: parity/build_reference.sh [build_dir]   (default /tmp/refbuild)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-/tmp/refbuild}"
REF="${REFERENCE_DIR:-/root/reference/cpp}"
EIGEN="$(python -c 'import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), "include"))' 2>/dev/null)"
[ -d "$EIGEN/Eigen" ] || { echo "no Eigen found"; exit 1; }
cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release \
    -DCMAKE_CXX_FLAGS="-isystem $HERE/refshim -isystem $EIGEN" >/dev/null
cmake --build "$BUILD" -j"$(nproc)"
echo "binaries:"
find "$BUILD" -maxdepth 3 -type f -executable
