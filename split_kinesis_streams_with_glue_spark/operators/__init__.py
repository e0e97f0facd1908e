"""Engine operators: stream split, CDC compaction, dedup family, similarity
search, text analysis, multimodal plumbing."""
