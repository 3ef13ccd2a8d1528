"""I/O: signal generators, IQ file I/O, host ingest."""
