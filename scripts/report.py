"""Results report generator — the generate_figures.py / accuracy_all.py
analog (reference scripts/generate_figures.py:283-304, accuracy_all.py).

Collects every committed result artifact (BENCH_r*.json bench lines,
results/*.json from run_resnet.py, results/accuracy_*.json from
scripts/accuracy.py) and renders RESULTS.md with the Table-10/11-style
summaries next to the reference baselines (BASELINE.md).

Usage:  python scripts/report.py [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference per-image seconds (scripts/ace_pre.log, 1-thread Xeon 8369B)
REF_SECONDS = {
    "resnet20_cifar10": 1453.96,
    "resnet32_cifar10": 2259.27,
    "resnet32_cifar100": 2327.27,
    "resnet44_cifar10": 3044.98,
    "resnet56_cifar10": 3907.68,
    "resnet110_cifar10": 7531.12,
}


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def render() -> str:
    lines = ["# ace_tpu results", ""]

    # -- per-model encrypted inference (Table 10 analog) -----------------
    rows = []
    for path in sorted(glob.glob(os.path.join(ROOT, "results", "*.json"))):
        data = _load(path)
        if not data:
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        if name.startswith("accuracy_") or not isinstance(data, list):
            continue
        model = name
        secs = [r["seconds"] for r in data if "seconds" in r]
        agree = [r.get("argmax_agree") for r in data]
        if not secs:
            continue
        best = min(secs)
        ref = REF_SECONDS.get(model)
        par = next((r.get("params") for r in data if r.get("params")), {})
        ptxt = (f"N=2^{(par['N']).bit_length() - 1} L={par['L']}"
                if par.get("N") else "-")
        sec_ok = ("yes" if "classical" in str(par.get("security", ""))
                  and "NOT" not in str(par.get("security", "")) else
                  "no (perf cfg, see SECURITY.md)")
        rows.append((model, len(secs), best, sum(secs) / len(secs),
                     sum(1 for a in agree if a), ref, ptxt, sec_ok))
    if rows:
        lines += ["## Encrypted inference latency (one TPU v5e chip)", "",
                  "| model | images | best s/img | mean s/img | argmax agree "
                  "| params | HE-std | reference s/img (1-thread Xeon) "
                  "| speedup |",
                  "|---|---|---|---|---|---|---|---|---|"]
        for model, n, best, mean, ok, ref, ptxt, sec_ok in rows:
            sp = f"{ref / best:.1f}x" if ref else "-"
            rf = f"{ref:.0f}" if ref else "-"
            lines.append(f"| {model} | {n} | {best:.1f} | {mean:.1f} "
                         f"| {ok}/{n} | {ptxt} | {sec_ok} | {rf} | {sp} |")
        lines.append("")

    # -- accuracy (Table 11 analog) ---------------------------------------
    acc_rows = []
    for path in sorted(glob.glob(os.path.join(
            ROOT, "results", "accuracy_*.json"))):
        data = _load(path)
        if data:
            acc_rows.append(data)
    if acc_rows:
        lines += ["## Encrypted-vs-plain agreement (Table 11 analog)", "",
                  "| model | images | argmax agreement | max |err| |",
                  "|---|---|---|---|"]
        for d in acc_rows:
            lines.append(f"| {d['model']} | {d['images']} "
                         f"| {d['agree']}/{d['images']} "
                         f"| {d['max_err']:.2e} |")
        lines.append("")

    # -- bench history ------------------------------------------------------
    bench = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        data = _load(path)
        if data:
            data = data.get("parsed") or data   # driver wraps the line
            if data and data.get("metric"):
                rnd = os.path.basename(path)[7:-5]
                bench.append((rnd, data))
    if bench:
        lines += ["## Benchmark history (driver-run, real TPU)", "",
                  "| round | metric | value | unit | vs baseline |",
                  "|---|---|---|---|---|"]
        for rnd, d in bench:
            lines.append(f"| {rnd} | {d.get('metric')} | {d.get('value')} "
                         f"| {d.get('unit')} | {d.get('vs_baseline')} |")
        lines.append("")

    # -- micro benches -------------------------------------------------------
    micro_paths = sorted(glob.glob(os.path.join(
        ROOT, "results", "bench_micro_r*.json")))
    for path in micro_paths:
        d = _load(path)
        if not d or "seconds" not in d:
            continue
        rnd = os.path.basename(path)[len("bench_micro_"):-5]
        lines += [f"## Op microbenchmarks {rnd} (ut_ckks_perf analog) — "
                  f"backend={d.get('backend')} N={d.get('degree')} "
                  f"num_q={d.get('num_q')}", "",
                  "| op | ms | ops/s |", "|---|---|---|"]
        for op, s in d["seconds"].items():
            lines.append(f"| {op} | {s * 1e3:.3f} | {1.0 / s:.1f} |")
        if d.get("key_switches_per_s"):
            lines.append(f"| (key-switches/s) | - "
                         f"| {d['key_switches_per_s']} |")
        lines.append("")

    if len(lines) == 2:
        lines.append("(no result artifacts found — run run_resnet.py / "
                     "scripts/accuracy.py / bench.py first)")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "RESULTS.md"))
    args = ap.parse_args()
    text = render()
    with open(args.out, "w") as f:
        f.write(text)
    print(text)


if __name__ == "__main__":
    main()
