#!/bin/sh
# Build the upstream reference bgt binary (read-only sources at /root/reference)
# into build/ref/ as a byte-parity oracle for tests and benchmarks.
# Object files and binaries live under build/ (gitignored); sources are never copied.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/../build/ref}
mkdir -p "$OUT"
cd "$OUT"
for f in kexpr bgzf hts fmf vcf atomic bedidx pbwt bgt main import view; do
    case $f in
        bgzf) FLAGS="-DBGZF_MT -DBGZF_CACHE";;
        fmf)  FLAGS="-DFMF_HAVE_HTS";;
        *)    FLAGS="";;
    esac
    [ "$f.o" -nt "$REF/$f.c" ] 2>/dev/null || \
        gcc -c -g -O2 -Wno-unused-function $FLAGS -I"$REF" "$REF/$f.c" -o "$f.o" 2>/dev/null
done
[ -x bgt ] || gcc kexpr.o bgzf.o hts.o fmf.o vcf.o atomic.o bedidx.o pbwt.o bgt.o main.o import.o view.o -o bgt -lpthread -lz -lm
# pbfview debug tool (PBWT-layer oracle)
[ -x pbfview ] || { gcc -c -g -O2 -Wno-unused-function -I"$REF" "$REF/pbfview.c" -o pbfview.o 2>/dev/null; gcc pbfview.o pbwt.o -o pbfview; }
# kexpr standalone evaluator (expression-layer oracle)
[ -x kexpr ] || gcc -g -O2 -Wno-unused-function -DKE_MAIN -I"$REF" "$REF/kexpr.c" -o kexpr -lm 2>/dev/null
echo "reference oracle at $OUT/bgt"
