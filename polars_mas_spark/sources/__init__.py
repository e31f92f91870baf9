"""Sources and sinks (parquet/csv/tsv readers and writers)."""
