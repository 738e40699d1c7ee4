"""CLI entry point: the analog of the reference's application main
(DODETL.scala:11-30 — load config, wire, run), so a reference user has
a runnable app, not just a library.

    python -m dod_etl_spark --conf CONF_DIR --output OUT_DIR \
        [--mode batch] [--sink parquet|text] [--cpus N]

or run any registry query by name against a testdata directory:

    python -m dod_etl_spark --query q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--output OUT_DIR] [--limit N]

CONF_DIR holds the reference-shaped globalConfig.json/tableConfig.json
(config.py); batch mode compiles and runs the OEE plan and writes the
OEE frame (plus the missing-dim and uncovered retry branches, which the
reference buffered in memory) to OUT_DIR. Streaming mode needs live
Kafka endpoints, which this sandbox lacks — it exits with the wiring
instructions rather than pretending.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dod_etl_spark")
    ap.add_argument("--conf", help="dir with globalConfig.json + tableConfig.json")
    ap.add_argument("--output", help="output directory")
    ap.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    ap.add_argument("--sink", choices=["parquet", "text"], default="parquet")
    ap.add_argument("--cpus", default=None, help="local core count override")
    ap.add_argument("--query", help="run one registry query by name instead of the pipeline")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="testdata dir for --query")
    ap.add_argument("--limit", type=int, default=20, help="rows to show for --query without --output")
    args = ap.parse_args(argv)

    if args.query:
        from dod_etl_spark.queries import QUERIES
        from dod_etl_spark.session import get_spark

        fn = QUERIES.get(args.query)
        if fn is None:
            print(
                f"unknown query {args.query!r}; available:\n  " + "\n  ".join(sorted(QUERIES)),
                file=sys.stderr,
            )
            return 2
        spark = get_spark("dod_etl_spark_cli", cpus=args.cpus)
        df = fn(spark, args.sf_dir)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output} ({spark.read.parquet(args.output).count()} rows)")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if not args.conf or not args.output:
        ap.error("--conf and --output are required unless --query is given")

    if args.mode == "streaming":
        print(
            "streaming mode: wire sources in code — see "
            "plans/builder.build_streaming_strict (maintainers[role].start(cdc, ckpt), "
            "pipeline.markers(...), pipeline.start(events, ...)); a broker is required.",
            file=sys.stderr,
        )
        return 2

    from dod_etl_spark.config import load_pipeline_spec
    from dod_etl_spark.plans.builder import build_batch
    from dod_etl_spark.session import get_spark
    from dod_etl_spark.streaming.sinks import oee_text_lines

    spec = load_pipeline_spec(args.conf)
    spark = get_spark("dod_etl_spark_cli", cpus=args.cpus)
    result = build_batch(spark, spec)
    out = args.output
    if args.sink == "text":
        oee_text_lines(result.oee).coalesce(1).write.mode("overwrite").text(
            os.path.join(out, "oee_text")
        )
    else:
        result.oee.write.mode("overwrite").parquet(os.path.join(out, "oee"))
    # The reference kept these in driver memory (dead retry buffer,
    # SURVEY §2.10 item 2); we persist them as replayable outputs.
    result.missing_po.write.mode("overwrite").parquet(os.path.join(out, "missing_po"))
    result.uncovered.write.mode("overwrite").parquet(os.path.join(out, "uncovered"))
    n = spark.read.parquet(os.path.join(out, "oee")).count() if args.sink == "parquet" else -1
    print(f"wrote {out} (oee rows: {n if n >= 0 else 'text mode'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
