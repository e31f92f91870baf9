"""Plan inspection helpers (pushdown/codegen assertions for tests)."""
