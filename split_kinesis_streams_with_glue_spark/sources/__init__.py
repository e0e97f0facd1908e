"""Sources & sinks: envelope JSON (batch + streaming), catalog registration,
JDBC backfill, and the Kinesis streaming source interface (prod-only)."""
