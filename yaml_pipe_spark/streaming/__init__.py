"""Structured Streaming mode: the reference's incremental batch loop
(state ledger + re-run) expressed as a real stream (SURVEY §7 step 6)."""
