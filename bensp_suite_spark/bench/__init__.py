"""Benchmark harness (testbed t1-t9 equivalent, SURVEY §7 phase 4)."""
