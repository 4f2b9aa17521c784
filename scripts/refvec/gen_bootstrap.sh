#!/bin/bash
# Build the bootstrap-stage dumper against the UNMODIFIED reference
# rtlib tree and (re)generate tests/vectors/ref_bootstrap.json.gz.
#
# -ffp-contract=off: the oracle's float tables must be IEEE-pairwise
# (no FMA contraction) so numpy float64 can reproduce them — gcc's
# default fp-contract=fast fuses the complex multiply-adds in
# Coeff_collapse and shifts llround boundaries by one ULP.
set -e
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF=${REF:-/root/reference}
R=$REF/fhe-cmplr/rtlib
OUT=${1:-$REPO/tests/vectors/ref_bootstrap.json.gz}
BUILD=$(mktemp -d)
gcc -O2 -w -ffp-contract=off -o "$BUILD/dump_bootstrap" \
    "$REPO/scripts/refvec/dump_bootstrap.c" \
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
"$BUILD/dump_bootstrap" "$BUILD/ref_bootstrap.json"
gzip -c "$BUILD/ref_bootstrap.json" > "$OUT"
python -c "import json,gzip; d=json.load(gzip.open('$OUT','rt')); print('keys:', sorted(d))"
