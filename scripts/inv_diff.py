"""Diff two precompile inventories: emit a new inventory holding only
the programs in NEW that are absent from OLD (by kind+builder_args+arg
shapes). Lets AOT workers skip programs already compiled from an older
inventory when the program set shifts between commits.

Usage: python scripts/inv_diff.py OLD.jsonl NEW.jsonl OUT.jsonl
"""

import json
import sys


def key(rec):
    return json.dumps([rec["kind"], rec["builder_args"],
                       rec["arg_shapes"]], sort_keys=True)


def main():
    old_path, new_path, out_path = sys.argv[1:4]
    old = [json.loads(l) for l in open(old_path)]
    new = [json.loads(l) for l in open(new_path)]
    old_hdr, old_recs = old[0], old[1:]
    new_hdr, new_recs = new[0], new[1:]
    # differing params mean no overlap at all
    if {k: v for k, v in old_hdr.items() if k != "model"} != \
       {k: v for k, v in new_hdr.items() if k != "model"}:
        seen = set()
    else:
        seen = {key(r) for r in old_recs}
    fresh = [r for r in new_recs if key(r) not in seen]
    with open(out_path, "w") as f:
        f.write(json.dumps(new_hdr) + "\n")
        for r in fresh:
            f.write(json.dumps(r) + "\n")
    print(f"old={len(old_recs)} new={len(new_recs)} fresh={len(fresh)} "
          f"-> {out_path}")


if __name__ == "__main__":
    main()
