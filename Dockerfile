# torchdriveenv_tpu image (reference analogue: Dockerfile:20-37, which ships
# CUDA 11.7 + torch + pytorch3d + lanelet2; here the stack is JAX + the
# in-repo engine — no CUDA, no lanelet2, no network NPC dependency).
#
# CPU image by default (tests, asset compilation, development). For TPU VMs,
# swap the jax install for the libtpu wheel as noted below.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make cmake ninja-build git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/torchdriveenv_tpu

# CPU jax; on a TPU VM use: pip install "jax[tpu]" \
#   -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir \
    jax flax optax chex orbax-checkpoint \
    gymnasium numpy PyYAML scipy pytest pillow

COPY pyproject.toml README.md DESIGN.md ./
COPY torchdriveenv_tpu ./torchdriveenv_tpu
COPY csrc ./csrc
COPY tools ./tools
COPY tests ./tests
COPY examples ./examples
COPY bench.py ./

# build the native map-compilation kernels (csrc/mapkit.cpp; optional — the
# asset compiler falls back to numpy, and maps/native.py also self-builds
# lazily on first use)
RUN mkdir -p torchdriveenv_tpu/maps/_native && \
    g++ -O3 -march=native -shared -fPIC -o \
        torchdriveenv_tpu/maps/_native/libmapkit.so csrc/mapkit.cpp || true

RUN pip install --no-cache-dir -e .

# default: run the test suite on a virtual 8-device CPU mesh
ENV XLA_FLAGS=--xla_force_host_platform_device_count=8
CMD ["python", "-m", "pytest", "tests/", "-q"]
