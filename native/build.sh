#!/bin/sh
# Build the native tile-ingest library (libtiff + libjpeg-turbo).
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja
ninja -C build
