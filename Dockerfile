# Mapperatorinator-TPU runtime image (reference ships Dockerfile +
# compose.yaml at /root/reference; this is the TPU-native equivalent).
#
# Build:  docker build -t mapperatorinator-tpu .
# CPU:    docker run --rm mapperatorinator-tpu python -m pytest tests/ -q
# TPU VM: build with JAX_TPU=1 to pull the libtpu-enabled jaxlib:
#         docker build --build-arg JAX_TPU=1 -t mapperatorinator-tpu .
FROM python:3.11-slim

ARG JAX_TPU=0

# g++/make: the native difficulty calculator (native/difficulty.cpp);
# ffmpeg: non-WAV audio decode fallback (audio/io.py)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && if [ "$JAX_TPU" = "1" ]; then \
         pip install --no-cache-dir 'jax[tpu]==0.9.0' \
           -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
       fi

COPY . .

# Native difficulty library (loaded via ctypes by
# mapperatorinator_tpu/native/difficulty.py)
RUN make -C native

# Web GUI port (web_ui.py --port)
EXPOSE 8765

CMD ["python", "web_ui.py"]
