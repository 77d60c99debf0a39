"""Sources & sinks (SURVEY.md §2.1 S1-S12): parquet/csv/jdbc readers,
contract-checked writers, and JSON bookmark/manifest state."""
