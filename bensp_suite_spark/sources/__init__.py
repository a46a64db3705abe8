"""Sources & sinks (SURVEY §2.1): binary-file ingestion, ddp archive format."""
