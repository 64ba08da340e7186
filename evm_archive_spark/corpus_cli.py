"""``python -m evm_archive_spark.corpus_cli`` — run the training-corpus
preparation pipeline (operators/corpus.py) over parquet documents from the
command line: profile, or dedup -> filter -> decontaminate -> mix ->
shuffle -> pack, writing the pack assignment table.

The assignment table (id, copy_id, n_tokens, pack_id, pack_off) is the
deterministic contract a sharded writer consumes; text never round-trips
through the driver.  Usage:

    python -m evm_archive_spark.corpus_cli --input docs.parquet \
        --out packs/ [--eval eval.parquet] [--weights '{"src0": 2.0}'] \
        [--budget 512] [--min-tokens 20] [--profile-only]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text, source, ...)")
    p.add_argument("--out", help="output dir for the pack assignment parquet")
    p.add_argument("--eval", dest="eval_path", default=None,
                   help="benchmark/eval parquet (doc_id, text) for decontamination; omit to skip")
    p.add_argument("--weights", default=None,
                   help="JSON {source: weight}; default 1.0 for every source present")
    p.add_argument("--budget", type=int, default=512, help="tokens per pack")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--shards", type=int, default=256)
    p.add_argument("--profile-only", action="store_true",
                   help="print the one-pass corpus profile JSON and exit")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.corpus import corpus_profile, prepare_training_corpus
    from .session import get_spark

    spark = get_spark("corpus-prep")
    docs = spark.read.parquet(args.input)

    if args.profile_only:
        row = corpus_profile(docs).collect()[0]
        print(json.dumps(row.asDict()))
        return 0

    if not args.out:
        p.error("--out is required unless --profile-only")

    if args.weights:
        weights = {k: float(v) for k, v in json.loads(args.weights).items()}
    else:
        weights = {
            r["source"]: 1.0
            for r in docs.select("source").distinct().collect()
        }

    if args.eval_path:
        eval_df = spark.read.parquet(args.eval_path)
    else:
        eval_df = spark.createDataFrame([], "doc_id long, text string")

    packed = prepare_training_corpus(
        docs, eval_df, weights,
        budget=args.budget, min_tokens=args.min_tokens, shards=args.shards,
    )
    packed.write.mode("overwrite").parquet(args.out)

    out = spark.read.parquet(args.out)
    stats = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("pack_id").alias("packs"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    print(json.dumps({"out": args.out, **{k: stats[k] for k in ("rows", "packs", "tokens")}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
