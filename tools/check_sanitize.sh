#!/bin/sh
# Run the native-touching test suites against an ASan+UBSan build of
# libbgt_host (the reference build keeps no sanitizers — Makefile:2 — so
# this is our own hygiene gate for the C++ runtime).
# The RLIMIT_DATA bounded-memory test is deselected: ASan shadow memory
# cannot fit under the cap by design.
set -e
DIR=$(cd "$(dirname "$0")/.." && pwd)
SO=/tmp/libbgt_host_asan.so
g++ -std=c++20 -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
    -shared -fPIC -pthread -o "$SO" "$DIR/native/bgt_host.cpp" -lz
LIBASAN=$(gcc -print-file-name=libasan.so)
cd "$DIR"
LD_PRELOAD="$LIBASAN" BGT_TPU_NATIVE_LIB="$SO" ASAN_OPTIONS=detect_leaks=0 \
python -m pytest tests/test_import.py tests/test_pbf.py tests/test_native.py \
    tests/test_tiles_shard.py tests/test_fmf_scan.py tests/test_atomize_fuzz.py \
    tests/test_view.py tests/test_cli.py tests/test_server.py \
    --deselect tests/test_tiles_shard.py::test_native_build_bounded_memory -q
