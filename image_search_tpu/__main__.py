"""``python -m image_search_tpu`` launches the search server."""

from image_search_tpu.server.app import main

if __name__ == "__main__":
    main()
