"""Sources and sinks: synthetic transcript generation, TableIO seam
(parquet in-sandbox, Iceberg in production), and testdata loaders.
≙ cesium/data_management.py † (SURVEY.md §2.1).
"""
