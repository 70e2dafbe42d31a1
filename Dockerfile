# Serving container (≙ reference Dockerfile: python slim + gunicorn-style
# single service with a /health healthcheck). The app is a stdlib WSGI server;
# ffmpeg shared libraries back the native C++ video decoder.
FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make curl \
        libavformat-dev libavcodec-dev libavutil-dev libswscale-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY deepfake_video_detection_tpu ./deepfake_video_detection_tpu
COPY native ./native

RUN pip install --no-cache-dir .
# pre-build the native decoder so first request doesn't pay the compile
RUN make -C native

ENV PORT=8000 \
    NO_AUTOLOAD=0 \
    FACE_DETECTOR=center \
    HOST=0.0.0.0

EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD curl -fsS http://localhost:${PORT}/health || exit 1

CMD ["python", "-m", "deepfake_video_detection_tpu.serve.app"]
