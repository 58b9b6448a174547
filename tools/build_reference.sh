#!/usr/bin/env bash
# Build the reference mbelib-neo (read-only at /root/reference) out-of-tree.
# Needed only for regenerating tables (tools/gen_tables.py) and golden test
# vectors (tools/gen_vectors.py); the committed npz files make the framework
# and its tests independent of the reference.
set -euo pipefail
REF=${1:-/root/reference}
BUILD=${2:-/tmp/refbuild}
cmake -S "$REF" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DMBELIB_BUILD_BENCHMARKS=ON -DMBELIB_ENABLE_SIMD=ON -DMBELIB_BUILD_TESTS=ON
cmake --build "$BUILD"
echo "reference built at $BUILD"
