# Serving/training image for vqvaehmm_tpu (reference: Dockerfile).
# On TPU VMs, base this on a libtpu-enabled image instead; jax[tpu] wheels
# come from the host environment there.
FROM python:3.11-slim

WORKDIR /app
COPY pyproject.toml ./
COPY vqvaehmm_tpu ./vqvaehmm_tpu
COPY configs ./configs
COPY inference_config.json ./inference_config.json
COPY entrypoint.sh ./entrypoint.sh

RUN pip install --no-cache-dir "jax[cpu]" optax numpy && \
    pip install --no-cache-dir fastapi "uvicorn[standard]" gunicorn && \
    pip install --no-cache-dir -e . && \
    chmod +x entrypoint.sh

EXPOSE 8000
ENTRYPOINT ["./entrypoint.sh"]
