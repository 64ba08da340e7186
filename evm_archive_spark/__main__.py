"""`python -m evm_archive_spark` — drop-in replacement for the reference's
binary: same EVM_ARCHIVE_* env surface, Spark execution (see pipeline.py).
"""

from __future__ import annotations

import sys

from .pipeline import env_config, run_batch, run_stream
from .session import get_spark


def main() -> int:
    cfg = env_config()
    spark = get_spark("evm-archive-spark-pipeline")
    if cfg["stream"]:
        q = run_stream(spark, cfg)
        q.awaitTermination()
        return 0
    counts = run_batch(spark, cfg)
    print({"tables": counts})
    return 0


if __name__ == "__main__":
    sys.exit(main())
