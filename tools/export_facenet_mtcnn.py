#!/usr/bin/env python
"""Export facenet-pytorch MTCNN weights for this framework's face detector.

The reference's production face detector is ``facenet_pytorch.MTCNN``
(``app.py:327-338``); its pretrained P/R/O-net weights (~2 MB) are public
but neither the package nor the weights ship in this image (zero egress).
Run this script in ANY environment that has ``facenet-pytorch`` installed:

    pip install facenet-pytorch
    python tools/export_facenet_mtcnn.py mtcnn_weights.pt

then copy the file here and point the serving env at it:

    MTCNN_WEIGHTS=/path/to/mtcnn_weights.pt     # FACE_DETECTOR defaults to
                                                # mtcnn when this is set

The exported layout (``pnet.conv1.weight`` …) is exactly what
``models/mtcnn.py:import_facenet_weights`` consumes; the bridge + cascade
are pinned against a scripted torch re-execution of the same architecture
in ``tests/test_mtcnn_golden.py``, so real weights drop in unchanged.
"""

import sys


def main(out_path: str) -> int:
    try:
        import torch
        from facenet_pytorch.models.mtcnn import ONet, PNet, RNet
    except ImportError as e:
        print(f"error: needs torch + facenet-pytorch installed ({e})",
              file=sys.stderr)
        return 1

    sd = {}
    for name, cls in (("pnet", PNet), ("rnet", RNet), ("onet", ONet)):
        net = cls(pretrained=True).eval()
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().cpu()
    torch.save(sd, out_path)
    print(f"wrote {len(sd)} tensors to {out_path}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
