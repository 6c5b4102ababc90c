"""image_search_tpu — a TPU-native semantic photo-search framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``olFi95/image_search`` (a Rust/Burn/SurrealDB photo-search engine):

- CLIP dual-tower embedding (text + vision) in pure JAX, one checkpoint for
  both towers (the reference splits them across Burn codegen and
  embed_anything; see ``/root/reference/server/src/clip.rs``).
- Fused on-device preprocessing (bicubic resize + normalize as MXU matmuls).
- An on-TPU vector index: batched matmul + top-k replaces the reference's
  external SurrealDB MTREE index (``server/src/clip.rs:140-143``).
- Rocchio-style relevance feedback fused into a single jitted step
  (``server/src/search.rs:60-67``).
- Data-parallel ingest and mesh-sharded search via ``shard_map`` collectives.
- The same HTTP surface: ``POST /search``, ``GET /scan``, ``GET /media/*``,
  SPA fallback (``server/src/main.rs:50-58``).
"""

from image_search_tpu.version import __version__

__all__ = ["__version__"]
