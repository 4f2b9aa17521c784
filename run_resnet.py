"""Encrypted ResNet inference driver — the dataset-main analog.

Mirrors the reference's generated per-model binaries + harness
(rtlib/ant/dataset/resnet_cifar.main.inc:35-119, scripts/perf.py):
load model -> select CKKS params -> keygen -> encode+encrypt image ->
run the encrypted graph -> decrypt -> compare against plain inference,
with RTM timing buckets reported at the end.

CIFAR batches aren't shipped in this environment (zero egress), so by
default the image is synthetic; pass --cifar <batch.bin> to use real
data (nn-addon cifar_reader format). Encrypted-vs-plain agreement is
the correctness check either way (the reference's rt_validate).

Usage:
  python run_resnet.py --model resnet20_cifar10 [--layers K]
      [--degree-override 8192] [--images 1] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet20_cifar10")
    ap.add_argument("--layers", type=int, default=0,
                    help="truncate graph to first K ops (0 = full)")
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--cifar", default="", help="CIFAR batch .bin path")
    ap.add_argument("--hamming-weight", type=int, default=192)
    ap.add_argument("--relu-depth", type=int, default=9,
                    help="composite sign depth (reference default 9 via "
                         "build_resnet*.sh; 11/13 for wider margins)")
    ap.add_argument("--relu-range", type=float, default=0.0,
                    help="uniform ReLU input range override; 0 = the "
                         "reference's per-ReLU tuned ranges "
                         "(compiler/relu_ranges.py)")
    ap.add_argument("--mul-level", type=int, default=0,
                    help="force the q-chain length (e.g. run a truncated "
                         "graph at full-model params so compiled programs "
                         "are shared)")
    ap.add_argument("--rtt", action="store_true",
                    help="runtime validation: lockstep plaintext shadow "
                         "checks after every op (the -VEC:rtt analog)")
    ap.add_argument("--json", default="")
    ap.add_argument("--checkpoint", default="",
                    help="per-op resume file (single-image runs): the "
                         "run resumes where it stopped if this exists")
    ap.add_argument("--max-rot-keys", type=int, default=0,
                    help="rotation-key LRU capacity override (0 = size "
                         "from the default HBM budget)")
    args = ap.parse_args()

    os.environ.setdefault("RTLIB_TIMING_OUTPUT", "1")
    import jax
    import ace_tpu  # noqa: F401
    from ace_tpu.models import resnet as M
    from ace_tpu.compiler.scheme_info import SchemeConfig
    from ace_tpu.runtime.timing import TIMING

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    g = M.load_model(args.model)
    if args.layers:
        g.ops = g.ops[:args.layers]
        g.output_name = g.ops[-1].outputs[0]

    from ace_tpu.compiler.relu_ranges import ranges_for
    vr_default, vr = ranges_for(args.model)
    if args.relu_range:
        vr_default, vr = args.relu_range, {}

    if args.cifar:
        classes = 100 if "cifar100" in args.model else 10
        imgs, labels = M.read_cifar_batch(args.cifar, args.images, classes)
    else:
        rng = np.random.default_rng(0)
        imgs = rng.uniform(-1.5, 1.5, (args.images, 3, 32, 32))
        labels = None

    # calibrate ReLU ranges against the actual inputs (plain oracle
    # pass) — the reference's ranges assume CIFAR-distributed inputs
    vr_default, vr = M.calibrate_relu_ranges(
        g, imgs, vr_default, vr,
        trace=lambda m: print(f"# {m}", file=sys.stderr, flush=True))

    cfg = SchemeConfig(security_level=0,
                       hamming_weight=args.hamming_weight,
                       first_mod_size=60, scaling_mod_size=56,
                       relu_mul_depth=args.relu_depth,
                       relu_value_range=vr_default,
                       relu_ranges=vr,
                       use_bootstrap=any(op.op_type == "Relu"
                                         for op in g.ops))
    t0 = time.time()
    ctx = None
    if args.mul_level:
        from ace_tpu.compiler.scheme_info import select_params
        from ace_tpu.runtime.context import FheContext
        info = select_params(g, cfg)
        info.mul_level = args.mul_level
        ctx = FheContext(scheme_info=info,
                         max_rot_keys=args.max_rot_keys or 100)
    model = M.compile_model(
        g, cfg, ctx=ctx, check_every=args.rtt,
        max_rot_keys=args.max_rot_keys,
        num_classes=100 if "cifar100" in args.model else 10,
        trace=lambda msg: print(f"# {msg}", file=sys.stderr, flush=True))
    print(f"# params: N=2^{model.scheme.poly_degree.bit_length()-1} "
          f"L={model.scheme.mul_level} "
          f"(context {time.time() - t0:.1f}s)", file=sys.stderr)
    from ace_tpu.compiler.scheme_info import security_posture
    sec = security_posture(model.scheme)
    print(f"# security: {sec['detail']}"
          + ("" if sec["compliant"] else " [perf-evaluation config — "
             "see SECURITY.md]"), file=sys.stderr)

    # resume: completed images live in the json; in-flight images in
    # their per-image checkpoint file
    results = []
    done_imgs = set()
    if args.json and os.path.exists(args.json):
        try:
            results = json.load(open(args.json))
            done_imgs = {r["image"] for r in results}
            if done_imgs:
                print(f"# resuming: images {sorted(done_imgs)} already "
                      f"done in {args.json}", file=sys.stderr)
        except Exception:
            results = []

    def flush():
        if args.json:
            with open(args.json + ".tmp", "w") as f:
                json.dump(results, f)
            os.replace(args.json + ".tmp", args.json)

    params_row = dict(
        N=model.scheme.poly_degree, L=model.scheme.mul_level,
        hamming_weight=model.scheme.hamming_weight,
        security=sec["detail"])
    for i in range(args.images):
        if i in done_imgs:
            continue
        plain = M.infer_plain(g, imgs[i])
        t0 = time.time()
        ck = (args.checkpoint + f".img{i}.npz") if args.checkpoint else ""
        logits = M.infer_encrypted(model, imgs[i], checkpoint=ck)
        dt = time.time() - t0
        if ck and os.path.exists(ck):
            os.remove(ck)
        k = min(len(logits), len(plain))
        err = float(np.max(np.abs(logits[:k] - plain[:k])))
        agree = bool(np.argmax(logits[:k]) == np.argmax(plain[:k]))
        row = dict(image=i, seconds=dt, max_err=err, argmax_agree=agree,
                   params=params_row)
        if labels is not None:
            row["label_match"] = bool(np.argmax(logits[:k]) == labels[i])
        results.append(row)
        flush()
        print(f"image {i}: {dt:.1f}s max_err={err:.3e} "
              f"argmax_agree={agree}", flush=True)

    print(TIMING.report(), file=sys.stderr)
    flush()


if __name__ == "__main__":
    main()
