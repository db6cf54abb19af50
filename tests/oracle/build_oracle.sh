#!/bin/sh
# Build the reference phylonium binary as a TEST ORACLE, with this repo's
# SA-IS standing in for libdivsufsort64.  Output: tests/oracle/bin/{phylonium,simf}
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT="$HERE/bin"
TMP="$OUT/obj"
mkdir -p "$OUT" "$TMP"
NATIVE_SRC="$HERE/../../phylonium_tpu/native/src/phylonium_native.cpp"

CFLAGS="-O2 -D_GNU_SOURCE -I$HERE -I$REF/libs"
# -fopenmp matches production phylonium builds (configure.ac
# enables it): without it the reference takes the no-OpenMP -t
# branch and warns on every -t, diverging from real deployments
CXXFLAGS="-O2 -std=c++17 -fopenmp -I$HERE -I$REF/src -I$REF/libs"

for f in pfasta seqcmp revseqcmp; do
  gcc $CFLAGS -std=c11 -c "$REF/libs/$f.c" -o "$TMP/$f.o"
done
for f in phylonium esa evo_model io process sequence; do
  g++ $CXXFLAGS -c "$REF/src/$f.cxx" -o "$TMP/$f.o"
done
g++ $CXXFLAGS -c "$HERE/shim.cpp" -o "$TMP/shim.o"
g++ -O3 -std=c++17 -c "$NATIVE_SRC" -o "$TMP/native.o"

g++ -O2 -fopenmp -o "$OUT/phylonium" "$TMP"/*.o -lm
g++ -O2 -std=c++17 -o "$OUT/simf" "$REF/test/simf.cxx"
echo "built $OUT/phylonium and $OUT/simf"
