"""Network read API: Thrift JDBC/ODBC SQL endpoint over the registered views.

The reference exposes its Postgres tables through a Postgraphile GraphQL
container (docker-compose.yaml:46-72, B27).  The Spark-native analog of
"point a client at the archive and query it" is the Hive Thrift server
embedded in the running session: every JDBC/ODBC client (beeline, DBeaver,
Tableau, any hive-jdbc consumer) gets the full SQL surface over the same
views the in-process queries use — a strictly larger query language than
the reference's auto-generated GraphQL CRUD.

Views are published as *global* temp views (``global_temp.<name>``), which
are visible to every Thrift connection's session — no reliance on the
static ``singleSession`` conf.

Scale note: the endpoint is a read gateway, not a data path — each query
executes as a normal distributed Spark job; only the final result rows
transit the Thrift connection.  On a cluster you run the same thing via
``sbin/start-thriftserver.sh``; this module is the in-process equivalent
for the library/test context.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, SparkSession

_STARTED: dict[int, int] = {}  # id(jvm session) -> bound port


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def publish_views(spark: SparkSession, views: dict[str, DataFrame]) -> list[str]:
    """Publish DataFrames as ``global_temp.<name>`` so every Thrift session
    can query them."""
    for name, df in views.items():
        df.createOrReplaceGlobalTempView(name)
    return [f"global_temp.{n}" for n in views]


def start_sql_endpoint(spark: SparkSession, port: int | None = None) -> int:
    """Start the embedded Thrift JDBC/ODBC server on ``port`` (a free port
    when None) and return the bound port.  Idempotent per session — the
    server can only start once per JVM, so repeated calls return the
    original port."""
    key = id(spark._jsparkSession)
    if key in _STARTED:
        return _STARTED[key]
    if port is None:
        port = free_port()
    jvm = spark.sparkContext._jvm
    jvm.java.lang.System.setProperty("hive.server2.thrift.port", str(port))
    jvm.java.lang.System.setProperty("hive.server2.thrift.bind.host", "127.0.0.1")
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    _STARTED[key] = port
    return port


def serve_archive(
    spark: SparkSession,
    logs: DataFrame,
    price: DataFrame | None = None,
    port: int | None = None,
) -> int:
    """One-call B27 stand-in: publish the archive tables plus the ten
    generated per-event decode views (init.sql:213-222) and start the SQL
    endpoint.  Returns the port a JDBC client should dial
    (``jdbc:hive2://127.0.0.1:<port>``)."""
    from .views import DEFAULT_EVENTS, event_view_df

    views = {"logs": logs}
    if price is not None:
        views["price"] = price
    for spec in DEFAULT_EVENTS:
        views[spec.view_name] = event_view_df(logs, spec)
    publish_views(spark, views)
    return start_sql_endpoint(spark, port)
