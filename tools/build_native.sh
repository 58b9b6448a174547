#!/usr/bin/env bash
# Build the host-side native helper library into mbe_tpu/data/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p mbe_tpu/data
gcc -O3 -shared -fPIC -fvisibility=hidden -o mbe_tpu/data/libmbehost.so \
    native/mbe_host.c
echo "built mbe_tpu/data/libmbehost.so"
