"""Structured Streaming surface (north-star; the reference has no streaming).

All window/dedup logic lives in functions that accept EITHER a batch or a
streaming DataFrame — ``F.window`` / ``session_window`` / ``dropDuplicates``
behave identically modulo watermark-driven state eviction, which is exactly
what makes batch-equivalence testing (SURVEY §7 risk 7) possible."""
