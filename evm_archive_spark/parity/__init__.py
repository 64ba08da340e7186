from .queries import PARITY_QUERIES, oracle_queries, spark_queries  # noqa: F401
