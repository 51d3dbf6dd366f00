#!/usr/bin/env python3
"""Min-merge isolated_bench.py artifacts into the round's
BENCH_ISOLATED file (round-11 protocol note: this box's interference —
whether co-tenant or its own previous JVM's decaying run-queue — can
only RAISE a sample, so min over passes per query converges on plan
cost from above).

Round-13 bookkeeping fix (VERDICT r12 item 4): the r12 artifact said
"3 passes" while recording two, because an IN-PLACE two-step merge
(pass1+pass2 -> OUT, then OUT+pass3) treated the already-merged OUT as
"pass 1" — which by then had no top-level sample/load vectors — and
renumbered. Now:
  - an input that is itself a merged artifact contributes its
    CONSTITUENT pass records (flattened), never a synthetic pass;
  - every pass record keeps its full samples + load1_at_start, and a
    record missing them is reported loudly;
  - the pass count in the protocol string is DERIVED from the records.

Usage: tools/merge_isolated.py OUT PASS1 PASS2 [PASS3 ...]
OUT may equal PASS1 (in-place merge).  Non-positive / missing rows in
a later pass never overwrite an earlier valid min (the -1.0
all-runs-failed marker must not win; same guard as scale_probe.py).
"""
import json, sys


def flatten_passes(arts):
    """One complete pass record per underlying isolated_bench run."""
    passes = []
    for path, art in arts:
        if "passes" in art:  # already-merged artifact: adopt its records
            for p in art["passes"]:
                passes.append(dict(p, source=p.get("source", path)))
        else:
            passes.append({
                "wall_s": art.get("wall_s"),
                "queries": art.get("queries"),
                "samples": art.get("samples"),
                "load1_at_start": art.get("load1_at_start"),
                # per-query [load1, steal%] measured inside the benched
                # JVM (round 14) — optional, older passes lack it
                "ambient": art.get("ambient"),
                "source": path,
            })
    for i, p in enumerate(passes, start=1):
        p["pass"] = i
        # `is None`, not falsy: an empty-but-present vector or a 0.0 load
        # is legitimate data, only real absence is a provenance gap
        if p.get("samples") is None or p.get("load1_at_start") is None:
            print(f"[merge] WARNING: pass {i} ({p.get('source')}) is missing "
                  "samples/load vectors — provenance incomplete",
                  file=sys.stderr)
    return passes


def main():
    out_path, paths = sys.argv[1], sys.argv[2:]
    arts = [(p, json.load(open(p))) for p in paths]
    base = arts[0][1]
    for p, art in arts[1:]:
        assert art.get("sf") == base.get("sf"), \
            f"sf dir mismatch between passes ({p})"
    passes = flatten_passes(arts)
    merged, src = {}, {}
    for rec in passes:
        for q, sec in (rec.get("queries") or {}).items():
            if sec is None or sec <= 0:
                # failed-run marker: never wins a min, but a query that
                # failed in EVERY pass must stay visible as -1.0 (absent
                # reads as "never benchmarked", hiding a crash regression)
                if q not in merged:
                    merged[q] = -1.0
                    # sentinel, not a pass number: there is no pass that
                    # "produced" an all-failed marker, and recording the
                    # first failing pass here read as a real min source
                    # (ADVICE r13)
                    src[q] = "all-failed"
                continue
            if q not in merged or merged[q] <= 0 or sec < merged[q]:
                merged[q] = sec
                src[q] = rec["pass"]
    out = {
        "sf": base.get("sf"),
        "protocol": f"{len(passes)} passes x fresh JVM per query, "
                    "min-merged via tools/merge_isolated.py; per-pass "
                    "sample vectors + load1 preserved under 'passes' "
                    "(pass count derived from the records)",
        "queries": merged,
        "min_source_pass": src,
        "passes": passes,
    }
    if base.get("mode") is not None:  # never emit a literal null mode
        out["mode"] = base["mode"]
    # carry forward any round-note keys the caller added to the base
    for k, v in base.items():
        if k not in out and k not in ("samples", "load1_at_start",
                                      "wall_s", "min_source_pass"):
            out[k] = v
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"[merge] wrote {out_path} ({len(merged)} queries, "
          f"{len(passes)} passes)")
    for q in sorted(merged):
        print(f"[merge] {q:26s} {merged[q]:8.2f} s  (pass {src[q]})")


if __name__ == "__main__":
    main()
