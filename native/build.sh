#!/bin/sh
# Build the native host-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC hostloader.cpp -o libhostloader.so
echo "built $(pwd)/libhostloader.so"
