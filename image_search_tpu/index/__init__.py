from image_search_tpu.index.index import VectorIndex
from image_search_tpu.index.store import EmbeddingStore

__all__ = ["VectorIndex", "EmbeddingStore"]
