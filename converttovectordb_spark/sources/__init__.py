"""Sources & sinks: repo file scan, overlap chunker, document store."""
