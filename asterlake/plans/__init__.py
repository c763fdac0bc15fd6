"""Physical-plan inspection helpers (pushdown / broadcast / codegen checks)."""
