from .readers import read_csv, read_jsonl, read_parquet, write_csv, write_jsonl, write_parquet

__all__ = [
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "write_csv",
    "write_jsonl",
    "write_parquet",
]
