from angelone_clickhouse_spark.sources.tables import (
    TICKS_ORACLE_CTE,
    load_table,
    register_tables,
    ticks,
)

__all__ = ["load_table", "register_tables", "ticks", "TICKS_ORACLE_CTE"]
