#!/usr/bin/env python3
"""Min-merge two isolated_bench.py artifacts into the round's
BENCH_ISOLATED file (round-11 protocol note: this box's interference —
whether co-tenant or its own previous JVM's decaying run-queue — can
only RAISE a sample, so min(pass1, pass2) per query converges on plan
cost from above; both passes' full sample vectors and per-row load
keys are preserved under 'passes' for provenance).

Usage: tools/merge_isolated.py OUT PASS1 PASS2 [PASS3 ...]
OUT may equal PASS1 (in-place merge).  Non-positive / missing rows in
a later pass never overwrite an earlier valid min (the -1.0
all-runs-failed marker must not win; same guard as scale_probe.py).
"""
import json, sys


def main():
    out_path, first, rest = sys.argv[1], sys.argv[2], sys.argv[3:]
    arts = [json.load(open(p)) for p in [first] + rest]
    base = arts[0]
    merged = dict(base.get("queries", {}))
    src = {q: 1 for q in merged}
    for i, art in enumerate(arts[1:], start=2):
        assert art.get("sf") == base.get("sf"), "sf dir mismatch between passes"
        for q, sec in art.get("queries", {}).items():
            if sec is None or sec <= 0:
                continue  # failed-run marker: never wins a min
            if q not in merged or merged[q] <= 0 or sec < merged[q]:
                merged[q] = sec
                src[q] = i
    base["queries"] = merged
    base["min_source_pass"] = src
    base["passes"] = [
        {"pass": i + 1, "wall_s": a.get("wall_s"),
         "queries": a.get("queries"), "samples": a.get("samples"),
         "load1_at_start": a.get("load1_at_start")}
        for i, a in enumerate(arts)
    ]
    # top-level samples/load keys now describe the merged view poorly;
    # keep pass-1's under passes[0] and drop the ambiguous top copies
    base.pop("samples", None)
    base.pop("load1_at_start", None)
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    print(f"[merge] wrote {out_path} ({len(merged)} queries, "
          f"{len(arts)} passes)")
    for q in sorted(merged):
        print(f"[merge] {q:26s} {merged[q]:8.2f} s  (pass {src[q]})")


if __name__ == "__main__":
    main()
