"""Large-scale training-data operators built on the same Ray Data idioms as
the retrieval engine: exact and near deduplication, similarity search over
embeddings, text quality analysis, and multimodal (binary-column) plumbing.
"""
