from soict20221_bigdata_financialplatform_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_bars_csv,
    read_bars_json,
)

__all__ = ["TABLES", "load_table", "load_tables", "read_bars_csv", "read_bars_json"]
