"""Parallel ahead-of-time program compilation.

The reference emits ONE straight-line C program per model and compiles
it once (fhe-cmplr/poly/src/poly2c_driver.cxx:68-115). The TPU-native
analog executes a stream of jitted XLA op bundles, each of which pays a
remote AOT compile the first time it is seen. This module removes that
serial compile wall:

  1. *Inventory*: run the full model once with a stub evaluator that
     records every jit-bundle cache key + argument shapes WITHOUT
     compiling or executing (output shapes come from jax.eval_shape,
     data is zeros). The CKKS level trajectory is data-independent, so
     the inventory is exact. Runs on the CPU backend in seconds/minutes.
  2. *Workers*: N processes each rebuild their shard of the recorded
     programs via the same builder methods and `.lower().compile()`
     them into the persistent XLA compilation cache. The remote
     compile service overlaps concurrent compiles almost perfectly
     (measured: 8 programs in 62 s vs 29 s for one), so the model's
     whole program set compiles in ~wall-clock of its largest shard.
  3. The real run then starts hot: every jit call hits the persistent
     cache by HLO hash.

Usage:
  python -m ace_tpu.runtime.precompile inventory --model resnet20_cifar10 \
      --out inv.jsonl [--relu-depth 9] ...
  python -m ace_tpu.runtime.precompile worker --inventory inv.jsonl \
      --shard 0 --num-shards 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


# -- (de)serialization of builder args and abstract call args -------------

def _ser_shapes(x):
    """Nested lists/tuples of arrays -> nested lists of {s, d}."""
    import jax
    if isinstance(x, (list, tuple)):
        return [_ser_shapes(v) for v in x]
    x = jax.numpy.asarray(x)
    return {"s": list(x.shape), "d": str(x.dtype)}


def _de_shapes(x):
    import jax
    if isinstance(x, list):
        return [_de_shapes(v) for v in x]
    return jax.ShapeDtypeStruct(tuple(x["s"]), x["d"])


def _ser_key(key):
    """Cache key (nested tuples of int/bool/str) -> JSON."""
    if isinstance(key, tuple):
        return [_ser_key(k) for k in key]
    return key


# -- inventory mode --------------------------------------------------------

def patch_inventory(ev, records: list):
    """Replace ev's jit dispatch with a record-shapes-only stub.

    Each record carries a "calls" count (how many times the program is
    dispatched per image) so runtime can be projected from per-program
    timings; counts are live-updated in place as the stub runs."""
    import jax
    import jax.numpy as jnp

    real_get = ev.__class__._get_jit.__get__(ev)
    stubs = {}

    def get_jit(key, builder, *builder_args):
        if key not in stubs:
            fn = real_get(key, builder, *builder_args)
            state = {}

            def stub(*args, _fn=fn, _key=key, _bargs=builder_args,
                     _state=state):
                if "out" not in _state:
                    _state["out"] = jax.eval_shape(_fn, *args)
                    _state["rec"] = {
                        "kind": _key[0],
                        "builder_args": _ser_key(tuple(_bargs)),
                        "arg_shapes": _ser_shapes(list(args)),
                        "calls": 0,
                    }
                    records.append(_state["rec"])
                _state["rec"]["calls"] += 1
                return jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), _state["out"])

            stubs[key] = stub
        return stubs[key]

    ev._get_jit = get_jit


def patch_encoder(enc) -> None:
    """Replace encode() with a zeros-poly stub of identical structure.

    Program cache keys depend on shapes/levels/extended-ness and the
    numpy-side mask patterns (dead-group pruning happens BEFORE
    encoding), never on encoded VALUES — but the real encode pays an
    O(N log N) embedding per (vector, level), which dominates inventory
    wall-clock (the per-ReLU bootstrap diagonals alone are minutes of
    numpy FFT work). The stub returns a zero RnsPoly with the exact
    (level, extended, scale, sf_degree, slots) metadata."""
    import jax.numpy as jnp
    from ace_tpu.ckks.encoder import Plaintext
    from ace_tpu.poly.poly import RnsPoly

    params = enc.params
    crt = params.crt

    def stub_encode(values, level=0, slots=0, sf_degree=1,
                    extended=False):
        n = params.degree
        slots_ = slots or n // 2
        level_ = level or crt.num_q
        rows = level_ + (crt.num_p if extended else 0)
        data = jnp.zeros((rows, n), dtype=jnp.uint64)
        p = RnsPoly(data, level_, crt.num_p if extended else 0, True)
        return Plaintext(p, params.scaling_factor ** sf_degree,
                         sf_degree, slots_)

    enc.encode = stub_encode
    enc.encode_cached = stub_encode

    def stub_encode_msg(values, slots=0):
        return jnp.zeros(params.degree, dtype=jnp.int64)

    enc.encode_msg = stub_encode_msg
    enc.encode_msg_cached = stub_encode_msg


def run_inventory(args):
    # inventory never needs the TPU: force CPU before touching jax
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from ace_tpu.models import resnet as M
    from ace_tpu.compiler.scheme_info import SchemeConfig

    g = M.load_model(args.model)
    from ace_tpu.compiler.relu_ranges import ranges_for
    vr_default, vr = ranges_for(args.model)
    if args.relu_range:
        vr_default, vr = args.relu_range, {}
    cfg = SchemeConfig(security_level=0,
                       hamming_weight=args.hamming_weight,
                       first_mod_size=60, scaling_mod_size=56,
                       relu_mul_depth=args.relu_depth,
                       relu_value_range=vr_default,
                       relu_ranges=vr,
                       use_bootstrap=any(op.op_type == "Relu"
                                         for op in g.ops))
    records: list = []
    t0 = time.time()
    from ace_tpu.compiler.scheme_info import select_params
    from ace_tpu.runtime.context import FheContext
    info = select_params(g, cfg)
    ctx = FheContext(scheme_info=info, max_rot_keys=100)
    patch_encoder(ctx.encoder)
    model = M.compile_model(
        g, cfg, ctx=ctx,
        num_classes=100 if "cifar100" in args.model else 10,
        trace=lambda m: print(f"# {m}", file=sys.stderr, flush=True))
    patch_inventory(model.ctx.evaluator, records)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1.5, 1.5, (3, 32, 32))
    M.infer_encrypted(model, img)
    scheme = model.scheme
    header = {
        "kind": "header", "model": args.model,
        "degree": scheme.poly_degree, "num_q": scheme.mul_level + 1,
        "first_mod_size": scheme.first_mod_size,
        "scaling_mod_size": scheme.scaling_mod_size,
        "hamming_weight": scheme.hamming_weight,
        "num_q_parts": scheme.q_part_num,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(header) + "\n")
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"inventory: {len(records)} unique programs in "
          f"{time.time() - t0:.1f}s -> {args.out}")


# -- worker mode ------------------------------------------------------------

_BUILDERS = {
    "addc": "_mk_add_scalar",
    "mp": "_mk_mul_plain",
    "mulrl": "_mk_mul_relin",
    "rs": "_mk_rescale",
    "rot": "_mk_rotate",
    "rsum": "_mk_rot_sum",
    "rmg": "_mk_rot_mac_groups",
}


def _detuple(x):
    """JSON lists back to tuples (builder args that feed closures)."""
    if isinstance(x, list):
        return tuple(_detuple(v) for v in x)
    return x


def _dedup_key(r):
    """Programs identical after liftjit const-lifting share one HLO.

    Automorphism index maps and key VALUES are lifted to runtime args,
    so two `rot` records at the same level (different rotation index)
    compile to the same executable; same for rsum/rmg where only the
    identity-pattern of auto_idxs is structural."""
    k, ba = r["kind"], r["builder_args"]
    if k == "rot":
        norm = ("lvl", ba[1])
    elif k == "rsum":
        norm = (tuple(a == 1 for a in ba[0]), ba[1])
    elif k == "rmg":
        norm = (tuple(a == 1 for a in ba[0]), json.dumps(ba[1]), ba[2])
    else:
        norm = json.dumps(ba)
    return (k, norm, json.dumps(r["arg_shapes"]))


def run_worker(args):
    import ace_tpu  # noqa: F401  (x64 + persistent cache)
    import jax
    from ace_tpu.ckks.params import CkksParams
    from ace_tpu.ckks.encoder import Encoder
    from ace_tpu.ckks.evaluator import Evaluator

    lines = [json.loads(l) for l in open(args.inventory)]
    header = lines[0]
    assert header["kind"] == "header"
    seen = set()
    recs = []
    for r in lines[1:]:
        dk = _dedup_key(r)
        if dk not in seen:
            seen.add(dk)
            recs.append(r)
    my = [r for i, r in enumerate(recs)
          if i % args.num_shards == args.shard]
    params = CkksParams(
        degree=header["degree"], num_q=header["num_q"],
        first_mod_size=header["first_mod_size"],
        scaling_mod_size=header["scaling_mod_size"],
        hamming_weight=header["hamming_weight"],
        num_q_parts=header["num_q_parts"])
    # builders never touch keys, so no KeyGenerator is needed
    ev = Evaluator(params, keygen=None, encoder=Encoder(params))
    print(f"worker {args.shard}/{args.num_shards}: {len(my)} programs, "
          f"backend={jax.default_backend()}", flush=True)
    for i, r in enumerate(my):
        t0 = time.time()
        builder = getattr(ev, _BUILDERS[r["kind"]])
        fn = builder(*_detuple(r["builder_args"]))
        abstract = _de_shapes(r["arg_shapes"])
        try:
            fn.lower(*abstract).compile()
            print(f"worker {args.shard}: [{i + 1}/{len(my)}] {r['kind']} "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # keep going; the run will compile stragglers
            print(f"worker {args.shard}: [{i + 1}/{len(my)}] {r['kind']} "
                  f"FAILED {type(e).__name__}: {e}", flush=True)
    print(f"worker {args.shard}: done", flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    inv = sub.add_parser("inventory")
    inv.add_argument("--model", default="resnet20_cifar10")
    inv.add_argument("--out", required=True)
    inv.add_argument("--hamming-weight", type=int, default=192)
    inv.add_argument("--relu-depth", type=int, default=9)
    inv.add_argument("--relu-range", type=float, default=0.0)
    wk = sub.add_parser("worker")
    wk.add_argument("--inventory", required=True)
    wk.add_argument("--shard", type=int, required=True)
    wk.add_argument("--num-shards", type=int, required=True)
    args = ap.parse_args()
    if args.cmd == "inventory":
        run_inventory(args)
    else:
        run_worker(args)


if __name__ == "__main__":
    main()
