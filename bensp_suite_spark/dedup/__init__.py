"""Content-defined-chunking dedup/compress pipeline (reference: apps/dedup)."""
