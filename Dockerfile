# ractip-tpu runtime image (the reference ships an Alpine static build +
# devcontainer, reference Dockerfile:1-31 / .devcontainer; here the runtime
# is a Python/JAX environment with the TPU PJRT plugin).
#
#   docker build -t ractip-tpu .
#   docker run --privileged ractip-tpu \
#       ractip-tpu /data/DIS.fa /data/DIS.fa -e
#
# On a Cloud TPU VM use the host network + TPU device grants; on CPU-only
# hosts the same image runs the jnp fallback path (JAX_PLATFORMS=cpu).

FROM python:3.12-slim

WORKDIR /opt/ractip-tpu
COPY pyproject.toml ./
COPY ractip_tpu ./ractip_tpu

# TPU wheel set; swap the extra for "jax[cpu]" on CPU-only deployments
RUN pip install --no-cache-dir "jax[tpu]>=0.7" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

ENTRYPOINT ["ractip-tpu"]
