"""Plan inspection helpers (explain dumps, pushdown assertions)."""
