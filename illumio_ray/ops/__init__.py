"""General-purpose Ray Data operator library.

Everything the reference's observability CLIs compute (SURVEY.md §2.5-§2.7:
grouped counts/rates, top-k, windows, distinct, dedup) plus the large-scale
training-data operators (dedup families, similarity search, text analysis,
multimodal plumbing), each expressed Ray-Data-first: column-pruned reads,
vectorized batch kernels, partial aggregation before shuffles, broadcast
small sides.
"""
