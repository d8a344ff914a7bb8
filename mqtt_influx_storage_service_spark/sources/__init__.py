from .tables import (
    TABLES,
    load_table,
    load_tables,
    table_column_max,
    table_row_count,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "table_column_max",
    "table_row_count",
]
