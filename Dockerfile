# Serving image (capability parity with reference Dockerfile:26-45):
#   docker build -t cornac-tpu-serving .
#   docker run -p 5000:5000 \
#     -v /path/to/save_dir:/models \
#     -e MODEL_PATH=/models/BPR -e MODEL_CLASS=cornac_tpu.models.BPR \
#     cornac-tpu-serving
#
# Uses the CPU jax wheel by default; swap the pip line for jax[tpu] on a
# TPU VM base image to serve from a chip.

FROM python:3.11-slim

WORKDIR /app

ENV MODEL_PATH=""
ENV MODEL_CLASS=""
ENV TRAIN_SET=""
ENV PORT=5000

COPY pyproject.toml README.md ./
COPY cornac_tpu ./cornac_tpu

RUN pip install --no-cache-dir "jax[cpu]" flask gunicorn && \
    pip install --no-cache-dir .

EXPOSE 5000

CMD ["sh", "-c", "gunicorn -b 0.0.0.0:${PORT} cornac_tpu.serving.app:app"]
