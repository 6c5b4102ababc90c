from image_search_tpu.parallel.mesh import make_mesh
from image_search_tpu.parallel.sharded_search import sharded_topk

__all__ = ["make_mesh", "sharded_topk"]
