# ssak_tpu container — counterpart of the reference Dockerfile (python base +
# audio system deps + toolkit install; reference pins sox/ffmpeg — here the
# audio stack is our own C++ (mpg123/libav) so only those shared libs are
# needed, no sox). TPU runtime: install the libtpu wheel matching your
# environment at deploy time (Cloud TPU VMs ship it preinstalled).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make cmake \
        libmpg123-dev libavformat-dev libavcodec-dev libavutil-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ssak_tpu
COPY pyproject.toml version.py ./
COPY ssak_tpu ./ssak_tpu
COPY tools ./tools
COPY demo ./demo

# jax[tpu] resolves libtpu on Cloud TPU hosts; CPU-only containers can use
# plain jax (tests, data curation, text normalization all run on CPU)
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax chex einops numpy pyyaml \
    && pip install --no-cache-dir -e .

# pre-build the native audio decoder + n-gram scorer (falls back to lazy
# build on first use if this fails on exotic arches)
RUN python -m ssak_tpu.audio.native.build || true

ENV WANDB_DISABLED=1
ENTRYPOINT ["sak-infer"]
