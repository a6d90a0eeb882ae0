#!/bin/sh
# Build the native image pipeline: produces native/libldmimg.so
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -Wall -o libldmimg.so image_pipeline.cpp -ljpeg -lpng
echo "built $(pwd)/libldmimg.so"
