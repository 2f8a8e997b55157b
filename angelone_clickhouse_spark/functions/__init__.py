from angelone_clickhouse_spark.functions.scalar import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
