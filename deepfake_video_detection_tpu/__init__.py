"""TPU-native deepfake video detection framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
``SaiPranav1506/DeepFake-Video-Detection`` (see ``SURVEY.md`` at the repo root
for the full structural analysis of the reference). Nothing in this package is
a port of the reference's PyTorch code: models are functional pytree modules
compiled with ``jax.jit`` / ``pjit``, the hot preprocessing path is a fused
Pallas kernel, and multi-chip scaling goes through ``jax.sharding.Mesh`` +
XLA collectives instead of any torch.distributed equivalent.

Sub-packages
------------
``nn``        functional neural-net substrate (conv/bn/linear/lstm/attention)
``models``    model families: backbone detectors, ensemble, CNN+LSTM, ViT+GCN,
              LogicRNN, ViT-GNN, conditional GAN, MTCNN face detector
``ops``       Pallas TPU kernels + XLA compute helpers (fused preprocessing,
              resize, NMS)
``data``      video decode, face extraction, dataset over .npz face stacks,
              dataset-preparation CLI, prefetching loader
``train``     trainers (basic / improved / ensemble), losses, schedules,
              calibration, LR finder, checkpointing (orbax + torch bridge)
``eval``      metrics + evaluation harness
``agents``    decision/monitoring/action agents, active learning, telemetry
``serve``     WSGI serving app (framework-free), predict_video, model loader
``parallel``  device mesh, shardings, collective helpers
``utils``     pytrees, config, env parsing, adjacency math
"""

__version__ = "0.1.0"

from deepfake_video_detection_tpu.utils import config as config  # noqa: F401
