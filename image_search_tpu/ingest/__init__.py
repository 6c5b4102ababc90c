from image_search_tpu.ingest.walk import IMAGE_EXTENSIONS, find_images
from image_search_tpu.ingest.decode import DecodePool, decode_image
from image_search_tpu.ingest.pipeline import ScanStats, scan_directory

__all__ = [
    "IMAGE_EXTENSIONS",
    "find_images",
    "DecodePool",
    "decode_image",
    "scan_directory",
    "ScanStats",
]
