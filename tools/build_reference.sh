#!/bin/sh
# Build the reference binary (/root/reference) for cross-validation
# (tools/ref_parity.py).  Eigen comes from the tensorflow wheel via the
# FindEigen3 shim; the vendored Eigen needs C++17 and chokes on the
# AVX512FP16 packet path with this g++, hence the flag edits.
set -e
cd "$(dirname "$0")"
mkdir -p refbuild
cd refbuild
cmake /root/reference -G Ninja -DCMAKE_BUILD_TYPE=Release \
  -DCMAKE_MODULE_PATH="$(cd ../cmake_shims && pwd)" \
  -DCMAKE_CXX_FLAGS="-std=c++17"
sed -i 's/-std=c++11/-std=c++17/g; s/-march=native\( -mno-avx512fp16\)*/-march=native -mno-avx512fp16/g' build.ninja
ninja
echo "built: $(pwd)/src/image-stitching"
