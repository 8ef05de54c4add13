#!/bin/sh
# Build the native host codec (no deps beyond a C++17 compiler).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    pointcloud_native.cpp -o libpointcloud_native.so
echo "built $(pwd)/libpointcloud_native.so"
g++ -O3 -march=native -std=c++17 -fopenmp -shared -fPIC \
    ndt_cpu.cpp -o libndt_cpu.so
echo "built $(pwd)/libndt_cpu.so"
