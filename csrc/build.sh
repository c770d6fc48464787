#!/bin/sh
# Build the native codec library next to this script.
# OpenMP is used when available; falls back to single-threaded.
set -e
cd "$(dirname "$0")"
if g++ -O3 -march=native -ffp-contract=off -shared -fPIC -fopenmp spz_codec.cpp \
      -o libspz_codec.so 2>/dev/null; then
    echo "built libspz_codec.so (OpenMP)"
else
    g++ -O3 -march=native -ffp-contract=off -shared -fPIC spz_codec.cpp -o libspz_codec.so
    echo "built libspz_codec.so (single-threaded)"
fi
