"""Large-scale training-data pipeline operators (beyond reference parity):
deduplication, similarity search, text analysis, multimodal plumbing.
"""
