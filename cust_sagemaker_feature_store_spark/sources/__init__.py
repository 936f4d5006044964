from .catalog_ddl import (
    create_database,
    create_external_table,
    drop_database,
    drop_table,
    register_temp_view,
    show_tables,
)
from .readers import (
    PURCHASE_EVENTS_SCHEMA,
    read_csv,
    read_json_lines,
    read_parquet,
    read_quoted_csv_as_strings,
)

__all__ = [
    "create_database", "create_external_table", "drop_database", "drop_table",
    "register_temp_view", "show_tables", "PURCHASE_EVENTS_SCHEMA", "read_csv",
    "read_json_lines", "read_parquet", "read_quoted_csv_as_strings",
]
