"""CKKS op-level microbenchmarks — the ut_ckks_perf analog.

Mirrors the reference's op microbenchmark suite
(fhe-cmplr/rtlib/ant/unittest/ut_ckks_perf.cxx:323-734): timed
add / add_plain / mul_plain / mul(+relin) / rescale / rotate /
NTT / iNTT / bootstrap at configurable degree, on whatever backend
JAX selects (TPU by default, CPU with JAX_PLATFORMS=cpu).

Usage: python bench_micro.py [--degree 65536] [--num-q 24] [--iters 10]
                             [--bootstrap] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timed(fn, out_leaf, iters, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(out_leaf(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(out_leaf(r))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--degree", type=int, default=1 << 16)
    ap.add_argument("--num-q", type=int, default=24)
    ap.add_argument("--first-mod-size", type=int, default=60)
    ap.add_argument("--scaling-mod-size", type=int, default=56)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bootstrap", action="store_true")
    ap.add_argument("--sparse-slots", type=int, default=0,
                    help="also time a sparse bootstrap at this slot "
                         "count (ut_ckks_perf times full AND sparse)")
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    import jax
    import ace_tpu  # noqa: F401
    from ace_tpu.ckks.params import CkksParams
    from ace_tpu.runtime.context import FheContext
    from ace_tpu.ops import ntt
    from ace_tpu.poly import poly as P

    print(f"# backend={jax.default_backend()} N={args.degree} "
          f"num_q={args.num_q}", file=sys.stderr)
    t0 = time.time()
    params = CkksParams(degree=args.degree, num_q=args.num_q,
                        first_mod_size=args.first_mod_size,
                        scaling_mod_size=args.scaling_mod_size,
                        hamming_weight=192)
    ctx = FheContext(params, seed=7)
    ev, enc = ctx.evaluator, ctx.encoder
    print(f"# context ready in {time.time() - t0:.1f}s", file=sys.stderr)

    n_slots = args.degree // 2
    rng = np.random.default_rng(0)
    msg = rng.uniform(-1, 1, n_slots).astype(np.complex128)
    ct1 = ev.encrypt(enc.encode(msg))
    ct2 = ev.encrypt(enc.encode(msg))
    pt = enc.encode(msg)
    ctx.keygen.rot_key(1)  # pre-generate

    results = {}

    def run(name, fn, out_leaf=lambda r: r.c0.data):
        dt = timed(fn, out_leaf, args.iters)
        results[name] = dt
        print(f"{name:24s} {dt * 1e3:10.3f} ms")

    run("add", lambda: ev.add(ct1, ct2))
    run("add_plain", lambda: ev.add_plain(ct1, pt))
    run("mul_plain", lambda: ev.mul_plain(ct1, pt))
    run("mul_relin", lambda: ev.mul(ct1, ct2))
    run("rescale", lambda: ev.rescale(ev.mul_plain(ct1, pt)))
    run("rotate", lambda: ev.rotate(ct1, 1))

    tables = params.crt.ntt_tables
    sub = ntt.gather_tables(tables, list(range(args.num_q)))
    coeffs = P.from_ntt(ct1.c0, params.crt)
    run("ntt_fwd", lambda: ntt.fwd(coeffs.data, sub), lambda r: r)
    run("ntt_inv", lambda: ntt.inv(ct1.c0.data, sub), lambda r: r)

    if args.bootstrap:
        bts = ctx.bootstrap_precom(n_slots)
        low = ev.encrypt(enc.encode(msg * 0.1, level=2))
        run("bootstrap_full", lambda: bts.bootstrap(low),
            lambda r: r.c0.data)
    if args.sparse_slots:
        sp = args.sparse_slots
        bts_sp = ctx.bootstrap_precom(sp)
        sp_msg = rng.uniform(-0.1, 0.1, sp).astype(np.complex128)
        low_sp = ev.encrypt(enc.encode(sp_msg, level=2, slots=sp))
        run(f"bootstrap_sparse_{sp}", lambda: bts_sp.bootstrap(low_sp),
            lambda r: r.c0.data)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "backend": jax.default_backend(),
                "degree": args.degree, "num_q": args.num_q,
                "first_mod_size": args.first_mod_size,
                "scaling_mod_size": args.scaling_mod_size,
                "iters": args.iters,
                "seconds": results,
                "key_switches_per_s": round(1.0 / results["rotate"], 1)
                if "rotate" in results else None,
            }, f, indent=1)


if __name__ == "__main__":
    main()
