"""Source and sink connectors (SURVEY.md §2.1).

- json_source  — S5: JSON document source with corrupt-record capture
- binary_source — S6: binary file source (+ digest column helper)
- sinks        — S7: CSV manifest sink; S8: keyed parquet upsert sink
"""
