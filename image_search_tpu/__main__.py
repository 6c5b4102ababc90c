"""``python -m image_search_tpu`` launches the search server."""

import os

if os.environ.get("ISX_FORCE_CPU"):
    # CI/smoke path (tools/smoke_deploy.py --cpu): this must run before the
    # first JAX op — the sandbox preimports jax, so the env var alone is
    # not enough (CLAUDE.md gotcha)
    import jax

    jax.config.update("jax_platforms", "cpu")

from image_search_tpu.server.app import main

if __name__ == "__main__":
    main()
