"""Column-expression helpers (vectors, text) — all JVM-side Catalyst
expressions, no Python UDFs."""
