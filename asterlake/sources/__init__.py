"""Sources and sinks: NeoWs REST ingestion, bronze JSON, parquet writers."""
