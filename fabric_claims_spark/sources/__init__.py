"""Sources & sinks: scans, state documents, merge-capable table storage."""
