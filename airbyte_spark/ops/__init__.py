"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — first-class components beside the CDC engine."""
