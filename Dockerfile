# TPU-ready serving/training image.
# Build: docker build -t xfmr-rec-tpu .
# The healthcheck mirrors the reference's config-system sanity probe
# (`lightning fit --print_config` — Dockerfile:64 there).
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install --no-install-recommends -y g++ \
    && rm -rf /var/lib/apt/lists/* \
    && useradd --create-home app

WORKDIR /app
COPY pyproject.toml README.md ./
COPY xfmr_rec_tpu ./xfmr_rec_tpu

# CPU jax by default; swap in jax[tpu] on TPU VMs.
RUN pip install --no-cache-dir -e .[logging] jax

USER app
EXPOSE 8000

HEALTHCHECK --interval=60s --timeout=30s \
    CMD python -m xfmr_rec_tpu.training.cli fit --print_config || exit 1

CMD ["python", "-m", "xfmr_rec_tpu.serving.prepare", "--serve"]
