"""Sources and sinks: ingestion to the uniform flat model, wire formats."""
