"""Function libraries: the Calculator registry plus training-data-pipeline
primitives (text analysis, dedup, similarity, multimodal plumbing)."""
