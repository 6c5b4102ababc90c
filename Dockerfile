# Deployment image for a Cloud TPU VM (the TPU runtime/libtpu comes from the
# host VM image). Counterpart of the reference's two-stage Docker build
# (/root/reference/Dockerfile) — one stage suffices: there is no WASM client
# to trunk-build and no model codegen step; the checkpoint is mounted.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg62-turbo-dev libpng-dev libwebp-dev libtiff-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY image_search_tpu ./image_search_tpu
COPY native ./native

# TPU wheel: jax[tpu] pulls libtpu; pin to the version you validated.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .
RUN make -C native

EXPOSE 3000
# Mount your photos at /pictures and the checkpoint+tokenizer at /models.
ENTRYPOINT ["image-search-tpu", "-w", "/models/clip.safetensors", \
            "--tokenizer-dir", "/models/tokenizer", \
            "-a", "0.0.0.0", "-m", "/pictures", "--index-dir", "/data/index"]
