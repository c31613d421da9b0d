"""Scaling probes for the dedup-at-ingest index (streaming/dedup_index).

Three probes, selected by the first argument:

``grow`` (default) — does per-batch cost stay bounded as the index
grows? Ingest N near-dup batches, time detect/upsert per batch,
compact halfway. Detect should be flat-ish: its candidate join scans
only probed buckets (round-5 pruned scans) plus Θ(batch) signature
work and Θ(answer) verify; upsert is Θ(batch).

``dupmass`` — round-4 verdict #1's acceptance probe: duplicate mass is
the index's own target workload, so it must not over-trigger the
degenerate-bucket cap (which counts DISTINCT contents since round 5)
and the union of per-batch detects must still equal the batch-mode
answer over the full corpus. Ingests B batches of the SAME texts
(distinct ids — pure duplicate mass, distinct contents constant),
then checks (a) the saturation report shows zero over-cap buckets,
(b) union(per-batch dups) == minhash_dedup_pairs(all docs) exactly,
via two-sided exceptAll counts.

``scan`` — round-4 verdict #2's acceptance probe: after growing the
index K× and compacting (bucket-sorted row groups + blooms), a SMALL
probe batch's detect must READ sublinear bytes. Runs the same detect
with pruning on vs off and reports the parquet scan metrics
(numOutputRows / filesSize) harvested from the executed plans.

Usage:
  python tools/dedup_index_probe.py [grow] [n_batches] [sf_dir]
  python tools/dedup_index_probe.py dupmass [n_batches] [sf_dir]
  python tools/dedup_index_probe.py scan [n_batches] [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, ".")


def _scan_metrics(df, path_substr: str) -> dict:
    """Sum parquet-scan leaf metrics of ``df``'s EXECUTED plan for scans
    whose description mentions ``path_substr``. Call after an action."""
    ep = df._jdf.queryExecution().executedPlan()
    leaves = ep.collectLeaves()
    tot = {"rows": 0, "files": 0, "bytes": 0, "scans": 0}
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "parquet" not in leaf.nodeName().lower():
            continue
        if path_substr not in leaf.toString():
            continue
        m = leaf.metrics()
        keys = m.keys().toList()
        vals = {}
        for j in range(keys.size()):
            k = keys.apply(j)
            vals[k] = m.apply(k).value()
        tot["rows"] += vals.get("numOutputRows", 0)
        tot["files"] += vals.get("numFiles", 0)
        tot["bytes"] += vals.get("filesSize", 0)
        tot["scans"] += 1
    return tot


def probe_grow(spark, sf_dir: str, n_batches: int) -> None:
    from bearly_spark.sources.tables import load_table
    from bearly_spark.streaming.dedup_index import (
        compact_dedup_index,
        near_dups_against_index,
        upsert_dedup_index_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
    n_docs = docs.count()
    idx = tempfile.mkdtemp(prefix="dedup-index-probe-")
    detect_s, upsert_s = [], []
    try:
        for b in range(n_batches):
            # distinct ids per batch; a distinct leading token per batch so
            # batches are near-dups (not exact dups) of each other
            batch = docs.select(
                (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"),
                F.concat(F.lit(f"batch{b} "), F.col("text")).alias("text"),
            )
            t0 = time.perf_counter()
            n_dups = near_dups_against_index(
                spark, idx, batch, threshold=0.8, exclude_batch=b
            ).count()
            t1 = time.perf_counter()
            upsert_dedup_index_batch(batch, b, idx)
            t2 = time.perf_counter()
            detect_s.append(t1 - t0)
            upsert_s.append(t2 - t1)
            n_files = len(list(Path(idx, "bands").rglob("*.parquet")))
            print(
                f"batch {b}: detect {t1 - t0:6.2f}s ({n_dups} dup pairs)  "
                f"upsert {t2 - t1:5.2f}s  index {(b + 1) * n_docs} docs / {n_files} band files",
                flush=True,
            )
            if b == n_batches // 2:
                folded = compact_dedup_index(spark, idx)
                print(f"  -- compacted {folded} batch partitions", flush=True)
        third = max(1, n_batches // 3)
        head = sum(detect_s[:third]) / third
        tail = sum(detect_s[-third:]) / third
        print(
            f"detect mean: first third {head:.2f}s, last third {tail:.2f}s "
            f"({tail / head:.2f}x at {n_batches}x index size); "
            f"upsert mean {sum(upsert_s) / len(upsert_s):.2f}s"
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def probe_dupmass(spark, sf_dir: str, n_batches: int) -> None:
    from bearly_spark.operators.dedup import minhash_dedup_pairs
    from bearly_spark.sources.tables import load_table
    from bearly_spark.streaming.dedup_index import (
        dedup_index_saturation_report,
        near_dups_against_index,
        upsert_dedup_index_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
    n_docs = docs.count()
    idx = tempfile.mkdtemp(prefix="dedup-index-dupmass-")
    try:
        all_dups = None
        corpus = None
        for b in range(n_batches):
            # SAME texts every batch, distinct ids: pure duplicate mass.
            # After B batches every content exists B times in the corpus.
            batch = docs.select(
                (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"), "text"
            )
            corpus = batch if corpus is None else corpus.unionByName(batch)
            t0 = time.perf_counter()
            dups = near_dups_against_index(
                spark, idx, batch, threshold=0.8, exclude_batch=b
            ).localCheckpoint(eager=True)
            dt = time.perf_counter() - t0
            all_dups = dups if all_dups is None else all_dups.unionByName(dups)
            upsert_dedup_index_batch(batch, b, idx)
            print(
                f"batch {b}: detect {dt:6.2f}s  {dups.count()} pairs "
                f"(duplicate mass {b + 1}x)",
                flush=True,
            )
        rep = dedup_index_saturation_report(spark, idx, max_bucket=1000).collect()[0]
        print(
            f"saturation: {rep.n_buckets} buckets, over cap {rep.over_cap_buckets}, "
            f"max distinct contents/bucket {rep.max_distinct_contents}",
            flush=True,
        )
        # checkpoint both sides: count + two exceptAll passes below
        # would otherwise re-run the whole batch pipeline three times
        want = minhash_dedup_pairs(
            corpus, "doc_id", "text", threshold=0.8
        ).localCheckpoint(eager=True)
        got = (
            all_dups.select("id_a", "id_b", "jaccard")
            .dropDuplicates(["id_a", "id_b"])
            .localCheckpoint(eager=True)
        )
        n_want, n_got = want.count(), got.count()
        miss = want.exceptAll(got).count()
        extra = got.exceptAll(want).count()
        verdict = "OK" if (miss == 0 and extra == 0 and rep.over_cap_buckets == 0) else "FAIL"
        print(
            f"{verdict}: batch-mode pairs {n_want}, streamed union {n_got}, "
            f"missing {miss}, extra {extra}, over-cap buckets {rep.over_cap_buckets}"
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def probe_scan(spark, sf_dir: str, n_batches: int) -> None:
    from bearly_spark.sources.tables import load_table
    from bearly_spark.streaming.dedup_index import (
        _pruned_scan,
        compact_dedup_index,
        minhash_band_table,
        near_dups_against_index,
        upsert_dedup_index_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
    n_docs = docs.count()
    idx = tempfile.mkdtemp(prefix="dedup-index-scan-")
    try:
        for b in range(n_batches):
            batch = docs.select(
                (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"),
                F.concat(F.lit(f"batch{b} "), F.col("text")).alias("text"),
            )
            upsert_dedup_index_batch(batch, b, idx)
        # small row groups so skip granularity exists at probe scale
        # (a production-size compacted band partition has thousands of
        # row groups from sheer size; a probe-size one would be a
        # single group and nothing could skip)
        compact_dedup_index(spark, idx, row_group_bytes=8 * 1024)

        # a 3-doc probe: the detect regime this index exists for is
        # "a few arriving docs vs a huge index", and skip ratio is
        # P(row group hits a probed key) — meaningful only when probed
        # keys per file << row groups per file (production indexes
        # have thousands of row groups; the probe fakes it with 8KB
        # groups and a small batch)
        probe = docs.limit(3).select(
            (F.col("doc_id") + F.lit(n_batches * n_docs)).alias("doc_id"),
            F.concat(F.lit("batch0 "), F.col("text")).alias("text"),
        )
        # end-to-end detect, pruned vs full: same pairs, different cost.
        # Two timed rounds after a warm-up — the first execution of each
        # plan shape pays one-time codegen/broadcast setup that would
        # otherwise be misread as pruning overhead (observed 18.7s cold
        # vs 6.6s warm for the identical pruned detect).
        results, times = {}, {}
        for rnd in ("warmup", "timed"):
            for label, max_keys in (("pruned", 8192), ("full-scan", 0)):
                t0 = time.perf_counter()
                rows = near_dups_against_index(
                    spark,
                    idx,
                    probe,
                    threshold=0.8,
                    exclude_batch=n_batches,
                    scan_prune_max_keys=max_keys,
                ).collect()
                dt = time.perf_counter() - t0
                results[label] = {(r.id_a, r.id_b) for r in rows}
                times[label] = dt
                if rnd == "timed":
                    print(f"detect {label:9s}: {dt:5.2f}s  {len(rows)} pairs", flush=True)
        same = results["pruned"] == results["full-scan"]
        print(f"pruned == full-scan pairs: {same}", flush=True)

        # scan-layer measurement: the exact filter shape detect pushes,
        # on the exact compacted layout — the scan node's numOutputRows
        # shows the rows surviving row-group skip (filesSize is the
        # static file footprint, not bytes read). Measured standalone
        # because detect materializes its pruned scans inside an
        # internal checkpoint whose metrics are not reachable from the
        # returned plan; the IN-pushdown threshold is raised exactly as
        # detect raises it.
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "513")
        bt = minhash_band_table(probe)
        keys = [r[0] for r in bt.select("bucket").distinct().collect()]
        ib = spark.read.parquet(f"{idx}/bands").select("doc_id", "band", "bucket")
        rows_read = {}
        for label, df in (
            ("bands pruned", _pruned_scan(ib, "bucket", keys)),
            ("bands full", ib),
        ):
            df.collect()
            m = _scan_metrics(df, "/bands")
            rows_read[label] = m["rows"]
            print(f"{label:12s}: rows read {m['rows']:>9}", flush=True)
        sublinear = rows_read["bands pruned"] < rows_read["bands full"] / 3
        verdict = "OK" if (same and sublinear) else "FAIL"
        print(
            f"{verdict}: pruned scan reads "
            f"{rows_read['bands pruned'] / max(rows_read['bands full'], 1):.1%} "
            f"of the index band rows with identical answers"
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    mode = "grow"
    if args and args[0] in ("grow", "dupmass", "scan"):
        mode = args.pop(0)
    n_batches = int(args[0]) if args else 8
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from bearly_spark.session import get_spark

    spark = get_spark("dedup-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    {"grow": probe_grow, "dupmass": probe_dupmass, "scan": probe_scan}[mode](
        spark, sf_dir, n_batches
    )


if __name__ == "__main__":
    main()
