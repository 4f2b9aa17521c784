"""Headline benchmark: NTT(2^16) throughput per chip vs native CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline is the single-thread native C NTT (ace_tpu/native) on this
host — the equivalent of the reference runtime's hot kernel
(rtlib/ant/src/util/ntt.c Forward_transform) measured in-situ, matching
the reference's 1-thread-per-image execution model (README.md:94).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 1 << 16
LIMBS = 8          # batch of limbs per device call
STEADY_ITERS = 30


def bench_device():
    import jax
    import jax.numpy as jnp
    import ace_tpu  # noqa: F401  (x64 + cache config)
    from ace_tpu.ops import ntt
    from ace_tpu.utils import number_theory as nt

    primes = nt.generate_q_primes(LIMBS, 60, 56, N)
    tables = ntt.make_ntt_tables(primes, N)
    rng = np.random.default_rng(0)
    data = np.stack([rng.integers(0, q, size=N, dtype=np.uint64)
                     for q in primes])
    fwd = jax.jit(ntt.ntt_fwd)
    x = jnp.asarray(data)
    fwd(x, tables).block_until_ready()  # compile
    # Median of 3 passes: a single pass is exposed to host/tunnel
    # contention (observed 57k..215k NTT/s for identical code under a
    # busy host) — median suppresses that noise without reporting a
    # best-case maximum as the committed figure (round-4 advice).
    rates = []
    for _ in range(3):
        # chain calls (output feeds input) so iterations can't be
        # deduplicated/cached anywhere in the execution path
        r = x
        t0 = time.perf_counter()
        for _ in range(STEADY_ITERS):
            r = fwd(r, tables)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / STEADY_ITERS
        rates.append(LIMBS / dt)
    return sorted(rates)[1], primes[0]


def bench_cpu_baseline(q: int) -> float:
    from ace_tpu.native import get_lib, ntt_fwd_inplace
    from ace_tpu.ops import modops
    from ace_tpu.utils import number_theory as nt
    from ace_tpu.ops.ntt import _bit_reverse_indices

    rev = _bit_reverse_indices(N)
    psi = nt.root_of_unity(2 * N, q)
    rou = [0] * N
    pw = 1
    for i in range(N):
        rou[rev[i]] = pw
        pw = pw * psi % q
    rou_np = modops.np_u64(rou)
    rou_prec = modops.np_u64([modops.precompute_shoup(w, q) for w in rou])
    rng = np.random.default_rng(1)
    data = rng.integers(0, q, size=N, dtype=np.uint64)
    ntt_fwd_inplace(data.copy(), rou_np, rou_prec, q)  # warm
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        ntt_fwd_inplace(data.copy(), rou_np, rou_prec, q)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


RESNET20_BASELINE_S = 1453.96  # scripts/ace_pre.log:28 (Xeon, 1 thread)
_ROOT = os.path.dirname(os.path.abspath(__file__))
RESULT_CANDIDATES = (
    os.path.join(_ROOT, "results", "resnet20_cifar10.json"),
    os.path.join(_ROOT, "logs", "resnet20_result.json"),
)
RESULT_JSON = next((p for p in RESULT_CANDIDATES if os.path.exists(p)),
                   RESULT_CANDIDATES[0])


def main():
    # headline: encrypted ResNet-20 s/image on this chip, measured by
    # run_resnet.py during the round (the full run needs a warm program
    # cache; re-measure with `python run_resnet.py --model
    # resnet20_cifar10`). vs_baseline = reference s/image / ours.
    if os.path.exists(RESULT_JSON) and not os.environ.get("ACE_BENCH_NTT"):
        rows = json.load(open(RESULT_JSON))
        if rows:  # an interrupted run can leave an empty list
            # image 0 pays one-time in-process tracing of every program
            # (the compile/codegen analog); steady-state per-image cost
            # is the comparable metric vs the reference's per-image loop
            rows_s = sorted(rows, key=lambda r: r["image"])
            steady = rows_s[1:] if len(rows_s) > 1 else rows_s
            secs = sorted(r["seconds"] for r in steady)
            s_img = secs[len(secs) // 2]  # median steady-state image
            print(json.dumps({
                "metric": "resnet20_cifar10_encrypted_s_per_image",
                "value": round(s_img, 2),
                "unit": "s/image",
                "vs_baseline": round(RESNET20_BASELINE_S / s_img, 2),
            }))
            return

    cpu_ntt_per_s = None
    try:
        # measure CPU baseline first (independent of device availability)
        import ace_tpu  # noqa: F401
        from ace_tpu.utils import number_theory as nt
        q0 = nt.gen_first_prime(N, 56)
        cpu_ntt_per_s = bench_cpu_baseline(q0)
    except Exception as e:  # pragma: no cover
        print(f"cpu baseline failed: {e}", file=sys.stderr)

    ntt_per_s, _ = bench_device()
    vs = (ntt_per_s / cpu_ntt_per_s) if cpu_ntt_per_s else 0.0
    print(json.dumps({
        "metric": "ntt_2^16_per_s_per_chip",
        "value": round(ntt_per_s, 2),
        "unit": "ntt/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
