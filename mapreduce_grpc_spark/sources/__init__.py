"""Sources and sinks: schema-first readers plus the reference's text
key-value format (read and write)."""
