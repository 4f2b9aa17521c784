"""Encrypted-vs-plain agreement harness — the accuracy_all.py analog
(reference scripts/accuracy_all.py; Table 11, README.md:22,144).

Runs N images through both the packed-plain oracle and the encrypted
path and records argmax agreement + max logit error. CIFAR binaries
are not shipped in this environment, so inputs default to synthetic
(uniform in the data range); pass --cifar <batch.bin> for real data,
in which case label accuracy is also recorded.

Usage:
  python scripts/accuracy.py --model resnet20_cifar10 --images 10 \
      [--cifar batch.bin] [--out results/accuracy_<model>.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet20_cifar10")
    ap.add_argument("--images", type=int, default=10)
    ap.add_argument("--cifar", default="")
    ap.add_argument("--relu-depth", type=int, default=13)
    ap.add_argument("--relu-range", type=float, default=16.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from ace_tpu.models import resnet as M
    from ace_tpu.compiler.scheme_info import SchemeConfig

    g = M.load_model(args.model)
    classes = 100 if "cifar100" in args.model else 10

    if args.cifar:
        imgs, labels = M.read_cifar_batch(args.cifar, args.images, classes)
    else:
        rng = np.random.default_rng(1)
        imgs = rng.uniform(-1.5, 1.5, (args.images, 3, 32, 32))
        labels = None

    # widen ReLU ranges for the actual inputs (plain calibration pass;
    # the tuned ranges assume CIFAR-distributed images)
    vr_default, vr = M.calibrate_relu_ranges(
        g, imgs, args.relu_range, {},
        trace=lambda m: print(f"# {m}", file=sys.stderr, flush=True))

    cfg = SchemeConfig(security_level=0, hamming_weight=192,
                       first_mod_size=60, scaling_mod_size=56,
                       relu_mul_depth=args.relu_depth,
                       relu_value_range=vr_default,
                       relu_ranges=vr,
                       use_bootstrap=True)
    model = M.compile_model(g, cfg, num_classes=classes,
                            trace=lambda m: print(f"# {m}",
                                                  file=sys.stderr,
                                                  flush=True))

    agree = 0
    label_hits_enc = label_hits_plain = 0
    max_err = 0.0
    per_image = []
    for i in range(args.images):
        plain = M.infer_plain(g, imgs[i])[:classes]
        t0 = time.time()
        logits = M.infer_encrypted(model, imgs[i])[:classes]
        dt = time.time() - t0
        err = float(np.max(np.abs(logits - plain)))
        ok = bool(np.argmax(logits) == np.argmax(plain))
        agree += ok
        max_err = max(max_err, err)
        row = dict(image=i, seconds=dt, max_err=err, argmax_agree=ok)
        if labels is not None:
            row["label"] = int(labels[i])
            label_hits_enc += int(np.argmax(logits) == labels[i])
            label_hits_plain += int(np.argmax(plain) == labels[i])
        per_image.append(row)
        print(f"image {i}: agree={ok} err={err:.3e} ({dt:.1f}s)",
              flush=True)
        # incremental flush so an interrupted run still reports
        if args.out:
            with open(args.out, "w") as f:
                json.dump(dict(model=args.model, images=i + 1,
                               agree=agree, max_err=max_err,
                               per_image=per_image,
                               synthetic=not args.cifar), f, indent=1)

    out = dict(model=args.model, images=args.images, agree=agree,
               max_err=max_err, per_image=per_image,
               synthetic=not args.cifar)
    if labels is not None:
        out["accuracy_encrypted"] = label_hits_enc / args.images
        out["accuracy_plain"] = label_hits_plain / args.images
    path = args.out or os.path.join(
        ROOT, "results", f"accuracy_{args.model}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"agreement {agree}/{args.images}, max_err {max_err:.3e} "
          f"-> {path}")


if __name__ == "__main__":
    main()
