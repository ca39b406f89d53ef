#!/bin/sh
# Build the native host runtime (libbgt_host.so) into build/lib/.
set -e
DIR=$(dirname "$0")/..
OUT="$DIR/build/lib"
mkdir -p "$OUT"
SRC="$DIR/native/bgt_host.cpp"
SO="$OUT/libbgt_host.so"
if [ ! -e "$SO" ] || [ "$SRC" -nt "$SO" ]; then
    g++ -std=c++20 -O3 -march=native -shared -fPIC -pthread -o "$SO" "$SRC" -lz
    echo "built $SO"
fi
