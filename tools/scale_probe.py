#!/usr/bin/env python3
"""Scale-up probe (round 9, VERDICT item 1): convert SCALE.md's 100 TB
design claims from reasoning into measurements.

1. Synthesize a ~Nx sf0.1-equivalent corpus by DEGREE-PRESERVING
   key-shifted replication: every key column of every fact table gets a
   per-replica stride, so the co-purchase graph becomes N disconnected
   copies of the sf0.1 graph — per-node degree, basket-size and
   posting-length distributions are EXACTLY preserved while every
   derived frame (edges, pairs, postings) grows Nx. Document texts get a
   per-replica seeded word shuffle (term frequencies preserved — BM25
   df and language stats scale honestly — but shingles are destroyed, so
   replicas are NOT near-duplicates of each other and the dedup
   candidate volume scales linearly instead of exploding in C(N,2)
   planted clusters). Embeddings get deterministic per-replica noise +
   renormalize (neighborhood structure similar, no exact-dup clusters).
2. Run graft.GraphProbe on the base and scaled dirs (derived-frame rows).
3. Run the heavy probe family isolated-warm (one fresh JVM per query,
   min over SPARK_GRAFT_WARM in-JVM repeats) at both scales.
4. Write BENCH_SCALE.json: per query, base/scaled seconds, the driving
   derived-row metric at both scales, and the time-vs-rows scaling
   exponent log(t_N/t_1)/log(rows_N/rows_1) — <= ~1 means the operator's
   wall-time grows at most linearly in its derived-frame rows.

Driver-side tooling (python3 + duckdb), like tools/compare.py — not a
repo dep. Usage:
  tools/scale_probe.py [--mult 10] [--base /root/testdata/sf0.1]
                       [--out BENCH_SCALE.json] [--warm 2] [--synth-only]
                       [query ...]
"""
import argparse, json, math, os, random, re, subprocess, sys, time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# query -> the GraphProbe metric (or table row count) that drives its
# per-stage data volume; the scaling exponent is measured against it
DRIVER_METRIC = {
    "q63_pagerank": "copurchase_edges",
    "q94_pagerank_directed": "copurchase_edges",
    "q149_ppr": "copurchase_edges",
    "q163_label_prop": "labelprop_sym_rows",
    "q165_user_knn": "user_pair_expansion",
    "q14_ngram_jaccard": "documents_rows",
    "q44_dedup_keep": "documents_rows",
    "q100_bm25": "documents_rows",
    "q68_knn_join": "embeddings_rows",
}
DEFAULT_QUERIES = list(DRIVER_METRIC)

STRIDE = 10_000_000  # > any sf0.1 key; one stride per replica index


def synth(base, out, mult):
    """Degree-preserving Nx replication of the corpus at `base` into
    `out` (see module docstring)."""
    import duckdb
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rd = lambda t: f"read_parquet('{base}/{t}.parquet')"

    def copy(sql, t):
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"[synth] {t:12s} {n:>10d} rows")

    reps = f"(SELECT unnest(range(0, {mult}))::BIGINT AS k) reps"

    # dimension tables: copied as-is (broadcast side at any scale)
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {rd(t)}", t)
    copy(f"""SELECT c_custkey + k * {STRIDE} AS c_custkey, c_name,
             c_nationkey, c_acctbal, c_mktsegment
             FROM {rd('customer')} CROSS JOIN {reps}""", "customer")
    copy(f"""SELECT s_suppkey + k * {STRIDE} AS s_suppkey, s_name,
             s_nationkey, s_acctbal
             FROM {rd('supplier')} CROSS JOIN {reps}""", "supplier")
    copy(f"""SELECT p_partkey + k * {STRIDE} AS p_partkey, p_name, p_brand,
             p_type, p_size, p_retailprice
             FROM {rd('part')} CROSS JOIN {reps}""", "part")
    copy(f"""SELECT o_orderkey + k * {STRIDE} AS o_orderkey,
             o_custkey + k * {STRIDE} AS o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
             FROM {rd('orders')} CROSS JOIN {reps}""", "orders")
    copy(f"""SELECT l_orderkey + k * {STRIDE} AS l_orderkey,
             l_partkey + k * {STRIDE} AS l_partkey,
             l_suppkey + k * {STRIDE} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
             FROM {rd('lineitem')} CROSS JOIN {reps}""", "lineitem")
    copy(f"""SELECT event_id + k * {STRIDE} AS event_id, ts,
             user_id + k * {STRIDE} AS user_id, event_type, value, props
             FROM {rd('events')} CROSS JOIN {reps}""", "events")
    # embeddings: deterministic per-(vec, replica, dim) noise, renormalize
    # (source vectors are unit-norm); replica 0 keeps the originals
    copy(f"""WITH e AS (SELECT vec_id + k * {STRIDE} AS new_id, k, embedding,
               list_transform(range(1, len(embedding) + 1), i ->
                 embedding[i]::DOUBLE + ((hash(vec_id * 131 + i * 31 + k)
                   % 2001)::BIGINT - 1000) / 10000.0) AS v, label
             FROM {rd('embeddings')} CROSS JOIN {reps})
             SELECT new_id AS vec_id,
               CASE WHEN k = 0 THEN embedding ELSE
                 list_transform(v, x -> (x / sqrt(list_dot_product(v, v)))::FLOAT)::FLOAT[]
               END AS embedding, label
             FROM e""", "embeddings")
    # documents: replica 0 original; replicas get a seeded word shuffle
    rows = con.execute(f"SELECT doc_id, text, lang, source FROM {rd('documents')} ORDER BY doc_id").fetchall()
    out_rows = []
    for k in range(mult):
        for doc_id, text, lang, source in rows:
            if k == 0:
                t = text
            else:
                words = text.split(" ")
                random.Random(doc_id * 1000003 + k).shuffle(words)
                t = " ".join(words)
            out_rows.append((doc_id + k * STRIDE, t, lang, source, len(t)))
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", out_rows)
    copy("SELECT * FROM docs ORDER BY doc_id", "documents")


def graph_probe(sfdir):
    """Run graft.GraphProbe and parse the [graphprobe] metric lines;
    append documents/embeddings row counts (duckdb)."""
    env = dict(os.environ, SPARK_GRAFT_NO_ARTIFACT="1")
    p = subprocess.run(["sbt", "-batch", f"runMain graft.GraphProbe {sfdir}"],
                       env=env, capture_output=True, text=True, cwd=REPO)
    text = p.stdout + p.stderr
    metrics = {}
    for m in re.finditer(r"\[graphprobe\] (\S+)\s+(\d+)", text):
        metrics[m.group(1)] = int(m.group(2))
    assert metrics, f"GraphProbe produced no metrics:\n{text[-2000:]}"
    import duckdb
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        metrics[f"{t}_rows"] = con.execute(
            f"SELECT count(*) FROM read_parquet('{sfdir}/{t}.parquet')").fetchone()[0]
    return metrics


def isolated(queries, sfdir, warm):
    sys.path.insert(0, HERE)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ib", os.path.join(HERE, "isolated_bench.py"))
    ib = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ib)
    res = {}
    for q in queries:
        l1 = round(os.getloadavg()[0], 2)
        sec, samples, ambient, raw = ib.run_one(q, sfdir, warm)
        # sec <= 0 is isolated_bench's all-runs-failed marker (-1.0):
        # storing it would poison downstream mins and produce negative
        # time_ratios — treat it exactly like the no-timing-line case.
        if sec is None or sec <= 0:
            print(f"[scale] {q}: FAILED (sec={sec})\n{raw[-1500:]}",
                  file=sys.stderr)
            continue
        res[q] = {"sec": sec, "samples": samples, "load1_at_start": l1,
                  "ambient": ambient}
        print(f"[scale] {q:24s} {sec:8.2f} s  (load1 {l1})  samples {samples}")
    return res


def validate(out_path, warm, queries):
    """Re-run both passes in (hopefully) a quieter window and MIN-merge
    into the existing artifact: a co-tenant burst can only RAISE a
    sample, so min(first run, validation run) converges on plan cost.
    Exponents are recomputed from the merged mins; the validation
    samples + loads are kept under 'validation' for provenance."""
    art = json.load(open(out_path))
    val = {}
    for sfdir, key in ((art["base_dir"], "base"), (art["scaled_dir"], "scaled")):
        print(f"[validate] isolated-warm at {key} ({sfdir}) ...")
        val[key] = isolated([q for q in queries if q in art["queries"]],
                            sfdir, warm)
    for q, row in art["queries"].items():
        for key, sec_key in (("base", "base_sec"), ("scaled", "scaled_sec")):
            # guard against a failed validation run: isolated() already
            # drops sec <= 0 rows, but never let a non-positive sample
            # win a min (min-merge assumes bursts can only RAISE a time)
            v = val.get(key, {}).get(q, {}).get("sec")
            if v is not None and v > 0:
                row[sec_key] = min(row[sec_key], v)
        tb, ts = row["base_sec"], row["scaled_sec"]
        rb, rs = row["rows_base"], row["rows_scaled"]
        if tb > 0 and ts > 0:
            row["time_ratio"] = round(ts / tb, 2)
            if rb > 0 and rs > rb:
                row["scaling_exponent"] = round(
                    math.log(ts / tb) / math.log(rs / rb), 3)
        else:  # a pre-fix artifact could carry the -1.0 marker: flag it
            row["time_ratio"] = None
            row["scaling_exponent"] = None
        print(f"[validate] {q:24s} base {tb:7.2f}  scaled {ts:8.2f}  "
              f"exp {row.get('scaling_exponent')}")
    art["validation"] = {
        "comment": ("second pass min-merged into base_sec/scaled_sec "
                    "(burst can only raise a sample); per-run samples and "
                    "loads below"),
        "runs": val,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"[validate] min-merged into {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled-dir", default=os.path.join(REPO, "scale_data", "sf1"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALE.json"))
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--synth-only", action="store_true")
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="re-run both passes and MIN-merge into --out")
    ap.add_argument("--section", default=None,
                    help="write the run under this key of an EXISTING --out "
                         "artifact instead of replacing it (e.g. mult60 — "
                         "the round-10 60x extension appends to the "
                         "committed 10x rows rather than clobbering them); "
                         "base timings/row-counts already present in the "
                         "artifact are reused via min-merge, so a quiet 10x "
                         "window's base rows aren't re-measured worse")
    ap.add_argument("queries", nargs="*")
    a = ap.parse_args()
    queries = a.queries or DEFAULT_QUERIES
    if a.validate:
        validate(a.out, a.warm, queries)
        return

    t0 = time.time()
    if not a.skip_synth:
        synth(a.base, a.scaled_dir, a.mult)
        print(f"[synth] done in {time.time()-t0:.0f}s")
    if a.synth_only:
        return

    print("[scale] GraphProbe on base ...")
    rows_base = graph_probe(a.base)
    print("[scale] GraphProbe on scaled ...")
    rows_scaled = graph_probe(a.scaled_dir)
    for k in sorted(rows_base):
        print(f"[rows] {k:28s} {rows_base[k]:>12d} -> {rows_scaled.get(k, 0):>14d}"
              f"  (x{rows_scaled.get(k, 0) / max(1, rows_base[k]):.2f})")

    print(f"[scale] isolated-warm at base ({a.base}) ...")
    base = isolated(queries, a.base, a.warm)
    print(f"[scale] isolated-warm at scaled ({a.scaled_dir}) ...")
    scaled = isolated(queries, a.scaled_dir, a.warm)

    per_query = {}
    for q in queries:
        if q not in base or q not in scaled:
            continue
        metric = DRIVER_METRIC.get(q)
        rb = rows_base.get(metric, 0)
        rs = rows_scaled.get(metric, 0)
        tb, ts = base[q]["sec"], scaled[q]["sec"]
        exp = (math.log(ts / tb) / math.log(rs / rb)
               if rb > 0 and rs > rb and ts > 0 and tb > 0 else None)
        per_query[q] = {
            "base_sec": tb, "scaled_sec": ts,
            "driver_metric": metric, "rows_base": rb, "rows_scaled": rs,
            "time_ratio": round(ts / tb, 2) if tb > 0 and ts > 0 else None,
            "rows_ratio": round(rs / rb, 2) if rb > 0 else None,
            "scaling_exponent": round(exp, 3) if exp is not None else None,
            "base": base[q], "scaled": scaled[q],
        }
    art = {
        "protocol": ("degree-preserving key-shifted replication of the sf0.1 "
                     "corpus (see tools/scale_probe.py docstring); one fresh "
                     f"JVM per query, SPARK_GRAFT_WARM={a.warm}, MIN reported; "
                     "scaling_exponent = log(t_N/t_1)/log(rows_N/rows_1), "
                     "<=1 means wall-time grows at most linearly in the "
                     "query's derived-frame rows"),
        "mult": a.mult, "base_dir": a.base, "scaled_dir": a.scaled_dir,
        "row_counts_base": rows_base, "row_counts_scaled": rows_scaled,
        "queries": per_query,
        "wall_s": round(time.time() - t0, 1),
    }
    if a.section:
        outer = json.load(open(a.out)) if os.path.exists(a.out) else {}
        # min-merge this window's fresh base rows with the committed ones
        # (same deterministic corpus; a burst can only RAISE a sample), so
        # the new section's exponents never blame the scaled run for a
        # noisy base measurement. GUARDED on base_dir (round-11 ADVICE): a
        # run against a different base corpus must not min-merge timings
        # across corpora. Provenance: base_sec_source records which run's
        # min won, next to the untouched fresh samples under row['base'].
        if outer.get("base_dir") == a.base:
            for q, row in per_query.items():
                prev = outer.get("queries", {}).get(q)
                if prev and prev.get("base_sec", 0) > 0:
                    if prev["base_sec"] < row["base_sec"]:
                        row["base_sec"] = prev["base_sec"]
                        row["base_sec_source"] = "min-merged from top-level 10x run"
                    else:
                        row["base_sec_source"] = "this run (fresh min kept)"
                    tb, ts = row["base_sec"], row["scaled_sec"]
                    rb, rs = row["rows_base"], row["rows_scaled"]
                    row["time_ratio"] = round(ts / tb, 2)
                    if rb > 0 and rs > rb:
                        row["scaling_exponent"] = round(
                            math.log(ts / tb) / math.log(rs / rb), 3)
        # MERGE into an existing section rather than replacing it: a
        # single-query extension run (e.g. adding q68 to mult60) must not
        # drop the section's committed rows for the other queries.
        prev_sec = outer.get(a.section)
        if (prev_sec and prev_sec.get("base_dir") == art["base_dir"]
                and prev_sec.get("scaled_dir") == art["scaled_dir"]):
            merged = dict(prev_sec.get("queries", {}))
            merged.update(per_query)
            art["queries"] = merged
            for rc in ("row_counts_base", "row_counts_scaled"):
                rcs = dict(prev_sec.get(rc, {}))
                rcs.update(art.get(rc, {}))
                art[rc] = rcs
            art["wall_s"] = round(prev_sec.get("wall_s", 0) + art["wall_s"], 1)
        outer[a.section] = art
        with open(a.out, "w") as f:
            json.dump(outer, f, indent=1)
            f.write("\n")
        print(f"[scale] wrote section '{a.section}' into {a.out}")
        return
    with open(a.out, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"[scale] wrote {a.out}")


if __name__ == "__main__":
    main()
