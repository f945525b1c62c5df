"""BPE merge induction at realistic round count (r3 verdict item 7).

q_bpe_merges runs 3 driver-paced rounds (oracle-bounded); real tokenizer
training runs tens of thousands over a corpus SAMPLE. This script drives
the SAME per-round plan (adjacent-pair count → 1-row argmax collect →
map-only corpus rewrite) for ``--rounds`` (default 100) rounds over a
sampled corpus and proves the loop amortizes:

  * per-round Spark JOB count is constant (a growing count means a new
    per-round scan crept in);
  * per-round wall time is flat (last-20 p50 ≤ 1.5× first-20 p50) — this
    requires a lineage cut per round: the corpus is localCheckpointed
    after each rewrite, otherwise round N's plan nests N regexp/replace
    expressions and analysis cost grows without bound (the documented
    expression-tree blowup failure mode). The 3-round gate query skips
    the cut because 3 nested replaces are free; this script is the proof
    the cut makes the loop O(rounds), not O(rounds²).

Emits ONE JSON line:
  {"rounds": N, "corpus_docs": n, "wall_s": ..., "round_s_p50_first20":
   ..., "round_s_p50_last20": ..., "slowdown": ..., "jobs_per_round_first":
   ..., "jobs_per_round_last": ..., "merges_tail": [last 3 merge rows],
   "tokens_before": ..., "tokens_after": ..., "bounds_ok": bool}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = 100
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    from pyspark.sql import functions as F

    from web_scraper_spark.session import get_spark

    spark = get_spark(
        app_name="wss-bpe-rounds", master="local[16]", shuffle_partitions=16
    )
    st = spark.sparkContext.statusTracker()

    d = spark.read.parquet(os.path.join(SRC, "documents.parquet")).select(
        "doc_id", "text"
    )
    # tokenizer-training sample: ~20% of the corpus (hash-sampled,
    # deterministic — the standard BPE practice; the per-round plan is
    # identical at any sample size)
    sample = d.filter(F.crc32(F.col("doc_id").cast("string")) % 5 == 0)
    corpus = sample.select(
        "doc_id",
        F.concat(
            F.lit(" "), F.regexp_replace("text", " ", "  "), F.lit(" ")
        ).alias("s"),
    ).localCheckpoint(eager=True)
    n_docs = corpus.count()
    tokens_before = (
        corpus.select(F.size(F.split(F.trim(F.col("s")), "  ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )

    def max_job_id() -> int:
        ids = st.getJobIdsForGroup()
        return max(ids) if ids else 0

    merges = []
    round_s: list[float] = []
    jobs: list[int] = []
    t_start = time.time()
    for r in range(1, rounds + 1):
        j0 = max_job_id()
        t0 = time.time()
        toks = corpus.select(F.split(F.trim(F.col("s")), "  ").alias("w"))
        pairs = toks.select(
            F.explode(
                F.expr(
                    "transform(slice(w, 1, size(w) - 1),"
                    " (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
                )
            ).alias("bg")
        ).select("bg.w1", "bg.w2")
        top = (
            pairs.groupBy("w1", "w2")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        best = top[0]
        pat = f" {best['w1']}  {best['w2']} "
        rep = f" {best['w1']}_{best['w2']} "
        old = corpus
        # map-only rewrite + lineage cut: round N's plan must not nest N
        # replace expressions
        corpus = corpus.select(
            "doc_id", F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s")
        ).localCheckpoint(eager=True)
        old.unpersist()
        merges.append((r, best["w1"], best["w2"], int(best["cnt"])))
        round_s.append(time.time() - t0)
        jobs.append(max_job_id() - j0)
        if r % 20 == 0:
            print(
                f"# round {r}: p50 {statistics.median(round_s[-20:]):.2f}s "
                f"jobs/round {statistics.median(jobs[-20:]):.0f} "
                f"merge={best['w1']}+{best['w2']} n={best['cnt']}",
                file=sys.stderr,
            )

    tokens_after = (
        corpus.select(F.size(F.split(F.trim(F.col("s")), "  ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    n = len(round_s)
    k = min(20, n // 2)
    first_s = statistics.median(round_s[:k])
    last_s = statistics.median(round_s[-k:])
    first_j = statistics.median(jobs[:k])
    last_j = statistics.median(jobs[-k:])
    out = {
        "rounds": n,
        "corpus_docs": n_docs,
        "wall_s": round(time.time() - t_start, 1),
        "round_s_p50_first20": round(first_s, 3),
        "round_s_p50_last20": round(last_s, 3),
        "slowdown": round(last_s / first_s, 3),
        "jobs_per_round_first": first_j,
        "jobs_per_round_last": last_j,
        "merges_tail": merges[-3:],
        "tokens_before": int(tokens_before),
        "tokens_after": int(tokens_after),
    }
    ok = last_s <= 1.5 * first_s and last_j <= first_j
    out["bounds_ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
