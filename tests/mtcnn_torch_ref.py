"""Scripted torch re-execution of the facenet-pytorch MTCNN for golden tests.

The reference's face detector is third-party native code
(``facenet_pytorch.MTCNN``, used at ``app.py:327-338`` and
``src/data_prepare.py:240``); neither the package nor its pretrained
weights exist in this image, so these modules re-create the EXACT network
architecture and ``state_dict`` layout (layer names, PReLU placement,
ceil-mode pooling, the ``permute(0, 3, 2, 1)`` pre-flatten) plus the cascade
glue (image pyramid, box decode, regression, square-ify, NMS).  Golden tests
random-init these with fixed seeds, export the state dict through
``import_facenet_weights``, and pin the JAX nets/cascade against the torch
execution — proving real facenet-pytorch weights would drop in correctly.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F


class TorchPNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 10, 3)
        self.prelu1 = nn.PReLU(10)
        self.pool1 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(10, 16, 3)
        self.prelu2 = nn.PReLU(16)
        self.conv3 = nn.Conv2d(16, 32, 3)
        self.prelu3 = nn.PReLU(32)
        self.conv4_1 = nn.Conv2d(32, 2, 1)
        self.conv4_2 = nn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool1(x)
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        probs = torch.softmax(self.conv4_1(x), dim=1)
        reg = self.conv4_2(x)
        return probs, reg


class TorchRNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 28, 3)
        self.prelu1 = nn.PReLU(28)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(28, 48, 3)
        self.prelu2 = nn.PReLU(48)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(48, 64, 2)
        self.prelu3 = nn.PReLU(64)
        self.dense4 = nn.Linear(576, 128)
        self.prelu4 = nn.PReLU(128)
        self.dense5_1 = nn.Linear(128, 2)
        self.dense5_2 = nn.Linear(128, 4)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool1(x)
        x = self.prelu2(self.conv2(x))
        x = self.pool2(x)
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous()  # facenet's flatten order
        x = self.prelu4(self.dense4(x.view(x.shape[0], -1)))
        probs = torch.softmax(self.dense5_1(x), dim=1)
        reg = self.dense5_2(x)
        return probs, reg


class TorchONet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3)
        self.prelu1 = nn.PReLU(32)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(32, 64, 3)
        self.prelu2 = nn.PReLU(64)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(64, 64, 3)
        self.prelu3 = nn.PReLU(64)
        self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = nn.Conv2d(64, 128, 2)
        self.prelu4 = nn.PReLU(128)
        self.dense5 = nn.Linear(1152, 256)
        self.prelu5 = nn.PReLU(256)
        self.dense6_1 = nn.Linear(256, 2)
        self.dense6_2 = nn.Linear(256, 4)
        self.dense6_3 = nn.Linear(256, 10)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool1(x)
        x = self.prelu2(self.conv2(x))
        x = self.pool2(x)
        x = self.prelu3(self.conv3(x))
        x = self.pool3(x)
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu5(self.dense5(x.view(x.shape[0], -1)))
        probs = torch.softmax(self.dense6_1(x), dim=1)
        reg = self.dense6_2(x)
        landmarks = self.dense6_3(x)
        return probs, reg, landmarks


def make_nets(seed: int = 0):
    """Deterministically-initialised torch nets + a facenet-layout state dict
    (keys ``pnet.conv1.weight``… as numpy)."""
    torch.manual_seed(seed)
    nets = {"pnet": TorchPNet(), "rnet": TorchRNet(), "onet": TorchONet()}
    sd = {}
    for name, net in nets.items():
        net.eval()
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().numpy().copy()
    return nets, sd


# ---------------------------------------------------------------------------
# cascade glue, following facenet_pytorch.models.utils.detect_face semantics
# ---------------------------------------------------------------------------


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, thr: float) -> np.ndarray:
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        union = a[i] + a[order[1:]] - inter
        iou = np.where(union > 0, inter / union, 0)
        order = order[1:][iou <= thr]
    return np.asarray(keep, np.int64)


def _rerec(boxes: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    out = boxes.copy()
    out[:, 0] = cx - side / 2
    out[:, 1] = cy - side / 2
    out[:, 2] = cx + side / 2
    out[:, 3] = cy + side / 2
    return out


def _apply_reg(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    return np.stack([boxes[:, 0] + reg[:, 0] * w,
                     boxes[:, 1] + reg[:, 1] * h,
                     boxes[:, 2] + reg[:, 2] * w,
                     boxes[:, 3] + reg[:, 3] * h], axis=-1)


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> torch.Tensor:
    """Square-box crop+resize. Uses the SAME resampler as the JAX cascade
    (``jax.image.scale_and_translate``, antialiased linear): resampling is
    shared glue pinned by its own exactness test
    (``test_video_faces.py::test_crop_and_resize_exactness``) — the golden
    cascade comparison isolates the NETWORK math, box decode/regression,
    rerec, NMS, and staging, which are implemented independently here."""
    import jax
    import jax.numpy as jnp

    jimg = jnp.asarray(img.astype(np.float32))
    crops = []
    for x1, y1, x2, y2 in boxes:
        side = max(x2 - x1, 1.0)
        scale = size / side
        crop = jax.image.scale_and_translate(
            jimg, (size, size, 3), (0, 1),
            jnp.asarray([scale, scale]),
            jnp.asarray([-y1 * scale, -x1 * scale]), "linear")
        crops.append(np.asarray(crop))
    arr = (np.stack(crops) if crops
           else np.zeros((0, size, size, 3), np.float32))
    return torch.from_numpy(arr).permute(0, 3, 1, 2).contiguous()


def pnet_scores(img_u8: np.ndarray, nets, min_face_size=20, factor=0.709
                ) -> np.ndarray:
    """All P-Net face scores over the pyramid (for adaptive golden-test
    thresholds: random-init weights have an arbitrary score distribution)."""
    import jax.image as jimage
    import jax.numpy as jnp

    H, W = img_u8.shape[:2]
    img = (img_u8.astype(np.float32) - 127.5) / 128.0
    m = 12.0 / min_face_size
    min_side = min(H, W) * m
    out = []
    while min_side >= 12:
        sh, sw = max(12, int(H * m)), max(12, int(W * m))
        scaled_np = np.asarray(jimage.resize(jnp.asarray(img), (sh, sw, 3),
                                             "linear"))
        with torch.no_grad():
            probs, _ = nets["pnet"](
                torch.from_numpy(scaled_np).permute(2, 0, 1)[None])
        out.append(probs[0, 1].numpy().ravel())
        m *= factor
        min_side *= factor
    return np.concatenate(out)


def torch_detect(img_u8: np.ndarray, nets, min_face_size=20,
                 thresholds=(0.6, 0.7, 0.7), factor=0.709):
    """Full torch cascade over one (H, W, 3) uint8 image → (boxes, scores)."""
    H, W = img_u8.shape[:2]
    img = (img_u8.astype(np.float32) - 127.5) / 128.0

    # stage 1: P-Net over the pyramid
    m = 12.0 / min_face_size
    min_side = min(H, W) * m
    scales = []
    while min_side >= 12:
        scales.append(m)
        m *= factor
        min_side *= factor

    all_boxes, all_scores = [], []
    import jax.image as jimage
    import jax.numpy as jnp

    for scale in scales:
        sh, sw = max(12, int(H * scale)), max(12, int(W * scale))
        # pyramid resize shared with the JAX cascade (see _crop_resize note)
        scaled_np = np.asarray(jimage.resize(jnp.asarray(img), (sh, sw, 3),
                                             "linear"))
        scaled = torch.from_numpy(scaled_np).permute(2, 0, 1)[None]
        with torch.no_grad():
            probs, reg = nets["pnet"](scaled)
        score = probs[0, 1].numpy()
        r = reg[0].numpy()
        ys, xs = np.meshgrid(np.arange(score.shape[0]),
                             np.arange(score.shape[1]), indexing="ij")
        stride, cell = 2.0, 12.0
        x1 = (xs * stride + 1) / scale
        y1 = (ys * stride + 1) / scale
        x2 = (xs * stride + cell) / scale
        y2 = (ys * stride + cell) / scale
        bw, bh = x2 - x1, y2 - y1
        boxes = np.stack([x1 + r[0] * bw, y1 + r[1] * bh,
                          x2 + r[2] * bw, y2 + r[3] * bh], axis=-1)
        mask = score > thresholds[0]
        all_boxes.append(boxes[mask])
        all_scores.append(score[mask])
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
    scores = np.concatenate(all_scores) if all_scores else np.zeros((0,))
    if boxes.shape[0] == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    keep = _nms_numpy(boxes, scores, 0.7)
    boxes, scores = boxes[keep], scores[keep]

    # stage 2: R-Net
    sq = _rerec(boxes)
    crops = (_crop_resize(img, sq, 24))
    with torch.no_grad():
        probs, reg = nets["rnet"](crops)
    rs = probs[:, 1].numpy()
    mask = rs > thresholds[1]
    rb = _apply_reg(sq[mask], reg.numpy()[mask])
    rs = rs[mask]
    if rb.shape[0] == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    keep = _nms_numpy(rb, rs, 0.7)
    rb, rs = rb[keep], rs[keep]

    # stage 3: O-Net
    sq = _rerec(rb)
    crops = (_crop_resize(img, sq, 48))
    with torch.no_grad():
        probs, reg, _ = nets["onet"](crops)
    os_ = probs[:, 1].numpy()
    mask = os_ > thresholds[2]
    ob = _apply_reg(sq[mask], reg.numpy()[mask])
    os_ = os_[mask]
    if ob.shape[0] == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    keep = _nms_numpy(ob, os_, 0.7)
    return ob[keep], os_[keep]
