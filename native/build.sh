#!/bin/sh
# Build the native IO library. core/native_io.py also invokes this
# automatically (cached) when the .so is missing.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -shared -fPIC -pthread -o build/libsift_io.so sift_io.cpp -lz
echo "built native/build/libsift_io.so"
