#!/bin/sh
# Build the native IO runtime (libreenact_io.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 reenact_io.cpp -o libreenact_io.so \
    -lavformat -lavcodec -lavutil -lswscale
echo "built $(pwd)/libreenact_io.so"
