from .readers import load_source_file, read_csv, read_excel_sheets, read_parquet
from .writers import (
    store_json_checkpoint,
    write_csv,
    write_excel_sheets,
    write_parquet,
)

__all__ = [
    "load_source_file",
    "read_csv",
    "read_excel_sheets",
    "read_parquet",
    "store_json_checkpoint",
    "write_csv",
    "write_excel_sheets",
    "write_parquet",
]
