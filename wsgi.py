"""WSGI entry point (≙ reference ``wsgi.py``): exposes ``app`` for any WSGI
server (`gunicorn wsgi:app`) and a threaded stdlib server for local prod."""

from deepfake_video_detection_tpu.serve.app import create_app, main

app = create_app()

if __name__ == "__main__":
    raise SystemExit(main())
