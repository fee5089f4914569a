#!/bin/sh
# Build the native tile-ingest library (libtiff + libjpeg-turbo).
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja
ninja -C build
# Stage the library into the package so a pip install ships it
# (tpuwsi/io/ingest.py also probes tpuwsi/native_lib/).
mkdir -p ../tpuwsi/native_lib
cp build/libtileingest.so ../tpuwsi/native_lib/
