#!/bin/bash
# Build the reference-vector dumper against the UNMODIFIED reference
# rtlib tree and (re)generate tests/vectors/ref_vectors.json.
#
# The reference rtlib needs gmp headers, absent in this image; gmp.h in
# this directory is an ABI shim over the installed libgmp.so.10.
set -e
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF=${REF:-/root/reference}
R=$REF/fhe-cmplr/rtlib
OUT=${1:-$REPO/tests/vectors/ref_vectors.json}
BUILD=$(mktemp -d)
gcc -O2 -w -o "$BUILD/dump_vectors" "$REPO/scripts/refvec/dump_vectors.c" \
    "$R"/ant/src/util/*.c \
    "$R"/common/src/rtlib_timing.c "$R"/common/src/rt_config.c \
    "$R"/common/src/trace.c \
    "$REF"/fhe-cmplr/third-party/BLAKE2/ref/blake2b-ref.c \
    "$REF"/fhe-cmplr/third-party/BLAKE2/ref/blake2xb-ref.c \
    -I"$REPO/scripts/refvec" -I"$R/include" -I"$R/ant/include" \
    -I"$REF/fhe-cmplr/third-party/uthash/include" \
    -I"$REF/fhe-cmplr/third-party/BLAKE2/ref" \
    /lib/x86_64-linux-gnu/libgmp.so.10 -lm
mkdir -p "$(dirname "$OUT")"
"$BUILD/dump_vectors" "$OUT"
python -c "import json; d=json.load(open('$OUT')); print('keys:', sorted(d))"
