#!/bin/sh
# Build the reference C LoRADS binary (activates
# tests/test_reference_parity.py and tools/compare_reference.py).
#
# The reference only compiles with INT32 on Linux (its UNIX_INT64
# config has type errors); this image ships only versioned .so.3
# BLAS/LAPACK libs and a .so.2 ARPACK, so find_library needs explicit
# paths and arpack needs a symlink (docs/ROUND1_NOTES.md gotchas).
#
# Usage: sh tools/build_reference.sh [build_dir]
# Default build_dir: /tmp/refbuild (the path the parity tests and
# LORADS_REF_BINARY default expect).
set -e
BUILD=${1:-/tmp/refbuild}
LIBDIR=/usr/lib/x86_64-linux-gnu

mkdir -p /tmp/reflibs
ln -sf "$LIBDIR/libarpack.so.2" /tmp/reflibs/libarpack.so

cmake -S /root/reference -B "$BUILD" \
    -DCMAKE_BUILD_TYPE=Release \
    -DLAPACK_LIBRARIES="$LIBDIR/liblapack.so.3" \
    -DBLAS_LIBRARIES="$LIBDIR/libblas.so.3" \
    -DCMAKE_EXE_LINKER_FLAGS=-L/tmp/reflibs
make -C "$BUILD" -j8

echo "reference binary: $BUILD/LoRADS_v_2_0_1-alpha"
echo "parity tests now active: python -m pytest tests/test_reference_parity.py -q"
