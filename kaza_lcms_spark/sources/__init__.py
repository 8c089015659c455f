"""Sources/sinks: image table reader + decode, catalog helpers."""
