"""Operator library: cleaning, SCD2 merge, marts, dedup, similarity,
text analysis, multimodal plumbing."""
