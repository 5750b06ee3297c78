"""Source operators: scans that normalize external data into the engine's
document model (SURVEY §2.1)."""
