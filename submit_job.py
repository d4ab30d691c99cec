"""spark-submit entry point (north rule: "ships as spark-submit --py-files
modules running on multi-executor clusters").

Package and run:

    python submit_job.py --package            # writes dist/groonga_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/groonga_spark.zip submit_job.py \\
        build --input /path/corpus.parquet --text-cols content \\
              --tokenizer code --output /path/index
    spark-submit --master <cluster> --py-files dist/groonga_spark.zip \\
        submit_job.py query --index /path/index --query 'table scan' -k 10
    spark-submit ... submit_job.py synth --docs 100000 --output /path/corpus.parquet

On a real cluster the same invocation works unchanged: everything the
executors need is in the zip (pure python + numpy/pandas, no native libs),
and the job only uses DataFrame ops + Arrow UDFs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def package(out: str = "dist/groonga_spark.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    dest = os.path.join(root, out) if not os.path.isabs(out) else out
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "groonga_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--package", action="store_true", help="write dist zip and exit")
    sub = ap.add_subparsers(dest="cmd")

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--text-cols", required=True, help="comma-separated")
    b.add_argument("--tokenizer", default="bigram")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--output", required=True)
    b.add_argument("--waves", type=int, default=8, help="checkpoint waves")

    q = sub.add_parser("query", help="top-k BM25 query against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--match-columns", default=None)
    q.add_argument("-k", type=int, default=10)

    s = sub.add_parser("synth", help="write the deterministic synthetic corpus")
    s.add_argument("--docs", type=int, required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--seed", type=int, default=42)

    args = ap.parse_args()
    if args.package:
        print(package())
        return
    if not args.cmd:
        ap.error("need a subcommand (or --package)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"groonga_spark_{args.cmd}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "synth":
        from groonga_spark.corpus import corpus_df

        corpus_df(spark, args.docs, seed=args.seed).write.mode("overwrite").parquet(
            args.output
        )
        print(json.dumps({"written": args.output, "docs": args.docs}))
        return

    if args.cmd == "build":
        from groonga_spark.index.checkpoint import build_index_checkpointed

        df = spark.read.parquet(args.input)
        idx = build_index_checkpointed(
            df,
            [c.strip() for c in args.text_cols.split(",")],
            args.output,
            tokenizer=args.tokenizer,
            id_col=args.id_col,
            waves=args.waves,
        )
        print(
            json.dumps(
                {"index": args.output, "n_docs": idx.stats.n_docs if idx else None}
            )
        )
        return

    if args.cmd == "query":
        from groonga_spark.index.checkpoint import read_index
        from groonga_spark.query.engine import SearchEngine

        eng = SearchEngine(read_index(spark, args.index))
        rows = eng.select(args.query, args.match_columns, k=args.k).collect()
        print(
            json.dumps(
                [{"doc_id": r["doc_id"], "score": round(r["score"], 4)} for r in rows]
            )
        )
        return


if __name__ == "__main__":
    main()
