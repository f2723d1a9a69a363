#!/bin/sh
# Build the native host library for quantumcollocation_tpu.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libqct_native.so qct_native.cpp
echo "built $(pwd)/libqct_native.so"
