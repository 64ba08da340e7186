"""B27 stand-in: the Thrift JDBC/ODBC endpoint serves the archive views to
an external client (beeline, the hive-jdbc CLI that ships with Spark)."""

from __future__ import annotations

import os
import subprocess
import time

import pyspark

from evm_archive_spark import api, fixtures, views

BEELINE = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")


def _beeline(port: int, sql: str) -> list[str]:
    r = subprocess.run(
        [
            BEELINE,
            "-u",
            f"jdbc:hive2://127.0.0.1:{port}",
            "--silent=true",
            "--outputformat=csv2",
            "-e",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return [l.strip() for l in r.stdout.splitlines() if l.strip().isdigit()]


def _pooled_thrift_endpoint_serves_views(spark):
    logs = fixtures.logs_df(spark)
    port = api.serve_archive(spark, logs)
    n_expected = logs.count()

    # server accepts connections shortly after startWithContext returns;
    # retry the first dial inside a warmup window
    deadline = time.time() + 60
    while True:
        try:
            nums = _beeline(port, "SELECT COUNT(*) AS n FROM global_temp.logs")
            break
        except AssertionError:
            if time.time() > deadline:
                raise
            time.sleep(3)
    assert nums and int(nums[-1]) == n_expected

    # a generated decode view answers over JDBC too (B21 x B27)
    transfer = next(s for s in views.DEFAULT_EVENTS if s.name == "Transfer")
    nums2 = _beeline(
        port,
        f"SELECT COUNT(*) AS n FROM global_temp.`{transfer.view_name}` "
        "WHERE amount IS NOT NULL",
    )
    assert nums2 and int(nums2[-1]) > 0

    # idempotent restart returns the same port
    assert api.start_sql_endpoint(spark) == port
