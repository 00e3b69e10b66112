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
export LD_PRELOAD="$ASAN_SO"
export NSP_NATIVE_ASAN=1
export ASAN_OPTIONS="detect_leaks=1:abort_on_error=0"
export LSAN_OPTIONS="suppressions=$PWD/nanosnp_tpu/io/native/lsan.supp:print_suppressions=0"
exec python -m pytest \
    tests/test_native_pileup.py \
    tests/test_bam_engine.py \
    tests/test_native_phaser.py \
    tests/test_haplotype_features.py \
    -q "$@"
