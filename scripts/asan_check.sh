#!/usr/bin/env bash
# Standing AddressSanitizer check for the native C++ (io/native/*.cpp) —
# the reference ships dna_sv_tensor/src/asan_makefile for the same purpose.
#
# Builds a separate instrumented .so (libnanosnp_asan.so, cached next to
# the sources) and runs every test that exercises native code under ASan
# with leak detection ON. libpython's own interpreter allocations are
# suppressed (io/native/lsan.supp); anything our library leaks — including
# the BGZF FIFO block cache — fails the run.
#
# Usage: scripts/asan_check.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."
ASAN_SO="$(g++ -print-file-name=libasan.so)"
# libstdc++ must be preloaded WITH asan: jaxlib's nanobind throws C++
# exceptions during jit lowering, and if libstdc++ resolves after the
# sanitizer runtime, ASan's __cxa_throw interceptor finds no real
# __cxa_throw and CHECK-fails ("real___cxa_throw != 0",
# asan_interceptors.cpp:320) — killing any test that jits in-process.
export LD_PRELOAD="$ASAN_SO $(g++ -print-file-name=libstdc++.so.6)"
export NSP_NATIVE_ASAN=1
export ASAN_OPTIONS="detect_leaks=1:abort_on_error=0"
export LSAN_OPTIONS="suppressions=$PWD/nanosnp_tpu/io/native/lsan.supp:print_suppressions=0"
exec python -m pytest \
    tests/test_native_pileup.py \
    tests/test_bam_engine.py \
    tests/test_native_phaser.py \
    tests/test_haplotype_features.py \
    -q "$@"
