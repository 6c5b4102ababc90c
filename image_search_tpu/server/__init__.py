from image_search_tpu.server.engine import SearchEngine
from image_search_tpu.server.args import build_parser, ServerArgs

__all__ = ["SearchEngine", "build_parser", "ServerArgs"]
