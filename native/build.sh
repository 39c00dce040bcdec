#!/bin/sh
# Build the native data-plumbing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -shared -fPIC \
    -o libegtpu.so egtpu_native.cpp
echo "built native/libegtpu.so"
