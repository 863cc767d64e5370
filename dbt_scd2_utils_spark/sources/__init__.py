"""Sources and sinks: incremental scans, watermark filters, table writers."""
