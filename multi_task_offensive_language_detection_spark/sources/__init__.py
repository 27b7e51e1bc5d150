"""Sources & sinks (SURVEY.md §2.1): test-table loaders, the clips
Parquet/Iceberg-shaped store, and the resume ledger."""
