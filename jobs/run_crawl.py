"""spark-submit entrypoint for the crawl engine.

Usage (cluster):
    zip -r wss.zip web_scraper_spark
    spark-submit --py-files wss.zip jobs/run_crawl.py \
        --state /path/to/state --payload /path/to/payload_parquet \
        --mode discover --pages 1000 --vpp 24 --batch-size 10000 \
        [--max-batches 100000] [--resume]

Local smoke:
    python jobs/run_crawl.py --state /tmp/crawl_state --demo

Modes:
  * ``seeded``  — frontier pre-seeded from a site-graph parquet (--site).
  * ``discover``— frontier grown by listing-page link extraction
                  (DiscoveringCrawlEngine; the full reference semantics).
  * ``--demo``  — generate the deterministic synthetic fixture and crawl it
                  end-to-end (no external inputs).

The job is resume-safe by construction: rerunning with --resume against an
existing --state directory continues from the last committed checkpoint
(plans/crawl.py snapshot semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="engine state directory")
    ap.add_argument("--payload", help="origin payload parquet (synthetic store)")
    ap.add_argument("--site", help="site-graph parquet (mode=seeded)")
    ap.add_argument("--mode", choices=["seeded", "discover"], default="discover")
    ap.add_argument("--pages", type=int, default=100)
    ap.add_argument("--vpp", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=240)
    ap.add_argument("--max-batches", type=int, default=100_000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--demo", action="store_true", help="synthetic end-to-end demo")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from web_scraper_spark import datagen, schemas
    from web_scraper_spark.plans.crawl import CrawlEngine
    from web_scraper_spark.plans.discover import DiscoveringCrawlEngine
    from web_scraper_spark.session import get_spark

    spark = get_spark(app_name="wss-crawl", master=args.master)

    if args.demo:
        args.payload = os.path.join(args.state, "origin_payload")
        if not os.path.exists(args.payload):
            spark.createDataFrame(
                datagen.gen_payload_pdf(args.pages * args.vpp),
                schema=schemas.PAYLOAD_SCHEMA,
            ).write.parquet(args.payload)
    if not args.payload:
        ap.error("--payload required (or --demo)")

    if args.mode == "seeded":
        eng = CrawlEngine(args.state, batch_size=args.batch_size)
        eng.attach_store(args.payload)
        if not args.resume:
            site = (
                spark.read.parquet(args.site)
                if args.site
                else datagen.site_graph_df(spark, args.pages, args.vpp)
            )
            eng.init(site, datagen.robots_df(spark) if args.demo else None)
    else:
        eng = DiscoveringCrawlEngine(args.state, batch_size=args.batch_size)
        eng.attach_store(args.payload)
        if not args.resume:
            eng.init_discovery(
                spark,
                args.pages,
                args.vpp,
                robots=datagen.robots_df(spark) if args.demo else None,
            )

    stats = eng.run(spark, max_batches=args.max_batches)
    for s in stats:
        print(json.dumps(s))
    order = eng.crawl_order(spark)
    seen = eng.seen_set(spark)
    print(
        json.dumps(
            {
                "done": True,
                "batches": len(stats),
                "trace_rows": 0 if order is None else order.count(),
                "seen": 0 if seen is None else seen.count(),
                # so a packaging test can assert the submitted master was
                # respected (get_spark must not override spark-submit)
                "master": spark.sparkContext.master,
            }
        )
    )


if __name__ == "__main__":
    main()
