#!/bin/sh
# MODE-switch entrypoint (reference: entrypoint.sh:4-15)
set -e
MODE="${MODE:-serve}"
case "$MODE" in
  train)
    exec python -m vqvaehmm_tpu.train.pipeline "${TRAIN_CONFIG:-configs/train_config.json}"
    ;;
  serve)
    exec python -m vqvaehmm_tpu.serve.httpd --config "${VQHMM_INFERENCE_CONFIG:-inference_config.json}" --port "${PORT:-8000}"
    ;;
  serve-prod)
    exec gunicorn -k uvicorn.workers.UvicornWorker -w "${WORKERS:-4}" -b "0.0.0.0:${PORT:-8000}" vqvaehmm_tpu.serve.app:app
    ;;
  serve-asgi)
    # dependency-free ASGI app (no fastapi; any ASGI server works)
    exec uvicorn --host 0.0.0.0 --port "${PORT:-8000}" vqvaehmm_tpu.serve.asgi:app
    ;;
  *)
    echo "unknown MODE=$MODE (train|serve|serve-prod|serve-asgi)" >&2
    exit 1
    ;;
esac
