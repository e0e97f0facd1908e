"""Structured Streaming: the streaming form of the stream splitter,
stateful dedup, and event-time windowed aggregation."""
