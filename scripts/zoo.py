"""Model-zoo runner: all ResNet variants through ONE shared context.

The perf.py / accuracy_all.py analog (reference scripts/perf.py,
accuracy_all.py — Table 10/11). Every shipped model selects identical
CKKS parameters (N=2^15, L=39, input level 2 — verified by
select_params), so a single FheContext serves all of them and the
in-process traced-program cache is paid once: model k>0 reuses model
0's jitted bundles wherever (op, level, pattern) match.

Usage:
  python scripts/zoo.py [--models resnet20_cifar10,resnet32_cifar10,...]
      [--images 1] [--out-dir results]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_MODELS = ("resnet20_cifar10,resnet32_cifar10,resnet32_cifar100,"
                  "resnet44_cifar10,resnet56_cifar10,resnet110_cifar10")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=DEFAULT_MODELS)
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--out-dir", default=os.path.join(ROOT, "results"))
    ap.add_argument("--max-rot-keys", type=int, default=90)
    ap.add_argument("--relu-depth", type=int, default=9)
    ap.add_argument("--relu-range", type=float, default=0.0,
                    help="0 = the reference's per-model tuned ranges")
    args = ap.parse_args()

    os.environ.setdefault("RTLIB_TIMING_OUTPUT", "1")
    import jax
    from ace_tpu.models import resnet as M
    from ace_tpu.compiler.scheme_info import (SchemeConfig, select_params,
                                              security_posture)
    from ace_tpu.runtime.context import FheContext
    from ace_tpu.runtime.timing import TIMING

    names = [n for n in args.models.split(",") if n]
    print(f"# backend={jax.default_backend()} models={names}",
          file=sys.stderr, flush=True)
    from ace_tpu.compiler.relu_ranges import ranges_for

    def cfg_for(model, graph=None):
        vr_default, vr = ranges_for(model)
        if args.relu_range:
            vr_default, vr = args.relu_range, {}
        if graph is not None:
            # widen ranges for the actual (synthetic) inputs — the
            # tuned ranges assume CIFAR-distributed images
            rng = np.random.default_rng(1)
            imgs = rng.uniform(-1.5, 1.5, (args.images, 3, 32, 32))
            vr_default, vr = M.calibrate_relu_ranges(
                graph, imgs, vr_default, vr)
        return SchemeConfig(security_level=0, hamming_weight=192,
                            first_mod_size=60, scaling_mod_size=56,
                            relu_mul_depth=args.relu_depth,
                            relu_value_range=vr_default,
                            relu_ranges=vr,
                            use_bootstrap=True)
    ctx = None
    os.makedirs(args.out_dir, exist_ok=True)
    # One context serves every model: size it to the max (N, L) over
    # the zoo (per-model tuned relu ranges can shift L by a level or
    # two between models; running a shallower model on a longer chain
    # is exact, just marginally more headroom than it needs).
    infos = {}
    for name in names:
        infos[name] = select_params(M.load_model(name), cfg_for(name))
    shared = max(infos.values(),
                 key=lambda i: (i.poly_degree, i.mul_level))
    import dataclasses as _dc
    shared = _dc.replace(shared, rotate_indices=())
    for name in names:
        g = M.load_model(name)
        classes = 100 if "cifar100" in name else 10
        cfg = cfg_for(name, g)
        info = infos[name]
        sec = security_posture(info)
        if ctx is None:
            t0 = time.time()
            ctx = FheContext(scheme_info=shared,
                             max_rot_keys=args.max_rot_keys)
            print(f"# shared context N=2^"
                  f"{shared.poly_degree.bit_length() - 1}"
                  f" L={shared.mul_level}"
                  f" ({time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
        assert (info.poly_degree == shared.poly_degree
                and info.mul_level <= shared.mul_level), \
            f"{name} params exceed the shared context"
        model = M.compile_model(
            g, cfg, ctx=ctx, num_classes=classes,
            trace=lambda m, _n=name: print(f"# [{_n}] {m}",
                                           file=sys.stderr, flush=True))
        rng = np.random.default_rng(1)
        imgs = rng.uniform(-1.5, 1.5, (args.images, 3, 32, 32))
        rows = []
        agree = 0
        max_err = 0.0
        for i in range(args.images):
            plain = M.infer_plain(g, imgs[i])[:classes]
            t0 = time.time()
            logits = M.infer_encrypted(model, imgs[i])[:classes]
            dt = time.time() - t0
            err = float(np.max(np.abs(logits - plain)))
            ok = bool(np.argmax(logits) == np.argmax(plain))
            agree += ok
            max_err = max(max_err, err)
            rows.append(dict(image=i, seconds=dt, max_err=err,
                             argmax_agree=ok,
                             # resnet110 ships no weight values in the
                             # reference; its graph runs He-initialized
                             # range-calibrated weights (timing is
                             # weight-independent) — label it so its
                             # agreement is not read as trained-model
                             # accuracy
                             weights=("synthetic-calibrated"
                                      if name == "resnet110_cifar10"
                                      else "reference-trained"),
                             params=dict(N=info.poly_degree,
                                         L=info.mul_level,
                                         hamming_weight=info.hamming_weight,
                                         security=sec["detail"])))
            print(f"{name} image {i}: {dt:.1f}s err={err:.3e} "
                  f"agree={ok}", flush=True)
            with open(os.path.join(args.out_dir, f"{name}.json"),
                      "w") as f:
                json.dump(rows, f)
        with open(os.path.join(args.out_dir,
                               f"accuracy_{name}.json"), "w") as f:
            json.dump(dict(model=name, images=args.images, agree=agree,
                           max_err=max_err, per_image=rows,
                           synthetic=True), f, indent=1)
    print(TIMING.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
