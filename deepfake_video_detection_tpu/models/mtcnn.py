"""MTCNN face detector (P/R/O-net cascade), TPU-native.

The reference gets face detection from ``facenet_pytorch.MTCNN``
(``src/data_prepare.py:240``, ``app.py:327-338``) — third-party native code
per SURVEY.md §2. This is the in-tree replacement, redesigned for XLA
(SURVEY.md §7 "hard parts: MTCNN on TPU"):

* the classic cascade is dynamically shaped (variable box counts per stage) —
  hostile to jit. Here every stage uses **fixed-size candidate buffers**:
  P-Net proposals are top-K-selected by score (masked, padded), NMS is the
  O(K²) masked-matrix algorithm, R/O-Net run on fixed (K, 24/24) and (K, 48)
  crop batches gathered with ``scale_and_translate``. One compile, any image.
* network weights use the facenet-pytorch ``state_dict`` key layout
  (``conv1.weight``, ``prelu1.weight``, ``dense5_1`` …) so public pretrained
  weights drop in through the torch bridge (the image has no such weights —
  ``data/faces.py`` falls back to a weight-free detector by default).
* facenet-pytorch quirk preserved for weight compatibility: dense layers
  flatten feature maps in (C, W, H) order (their ``permute(0, 3, 2, 1)``).

Pyramid scales are static (computed from the configured image size), so the
whole detector is one jitted function per input resolution.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]


def _prelu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = p["weight"].astype(x.dtype)  # per-channel, channels-last
    return jnp.where(x >= 0, x, x * w)


def _ceil_pool(x: jnp.ndarray, k: int, s: int) -> jnp.ndarray:
    """MaxPool with ceil_mode=True semantics (facenet-pytorch uses it)."""
    H, W = x.shape[1], x.shape[2]
    pad_h = max(0, (math.ceil((H - k) / s) * s + k) - H)
    pad_w = max(0, (math.ceil((W - k) / s) * s + k) - W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, s, s, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    return {"weight": I.kaiming_uniform(kw, (k, k, cin, cout)),
            "bias": I.uniform_bias(kb, (cout,), cin * k * k)}


def _dense_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    return {"weight": I.kaiming_uniform(kw, (cout, cin)),
            "bias": I.uniform_bias(kb, (cout,), cin)}


def _prelu_init(ch):
    return {"weight": jnp.full((ch,), 0.25, jnp.float32)}


def _facenet_flatten(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC → flatten in facenet-pytorch's (C, W, H) order so bridged dense
    weights line up: torch does NCHW.permute(0,3,2,1) → (N, W, H, C) → view."""
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)


class PNet:
    """Proposal net: fully-convolutional 12×12 detector, stride 2."""

    def init(self, rng) -> Params:
        ks = jax.random.split(rng, 5)
        return {
            "conv1": _conv_init(ks[0], 3, 3, 10), "prelu1": _prelu_init(10),
            "conv2": _conv_init(ks[1], 3, 10, 16), "prelu2": _prelu_init(16),
            "conv3": _conv_init(ks[2], 3, 16, 32), "prelu3": _prelu_init(32),
            "conv4_1": _conv_init(ks[3], 1, 32, 2),
            "conv4_2": _conv_init(ks[4], 1, 32, 4),
        }

    def apply(self, p: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``x``: (N, H, W, 3) in [-1, 1]. Returns (probs (N,h,w,2), reg (N,h,w,4))."""
        x = _prelu(p["prelu1"], L.conv2d(p["conv1"], x))
        x = _ceil_pool(x, 2, 2)
        x = _prelu(p["prelu2"], L.conv2d(p["conv2"], x))
        x = _prelu(p["prelu3"], L.conv2d(p["conv3"], x))
        probs = jax.nn.softmax(L.conv2d(p["conv4_1"], x), axis=-1)
        reg = L.conv2d(p["conv4_2"], x)
        return probs, reg


class RNet:
    """Refine net on 24×24 crops."""

    def init(self, rng) -> Params:
        ks = jax.random.split(rng, 6)
        return {
            "conv1": _conv_init(ks[0], 3, 3, 28), "prelu1": _prelu_init(28),
            "conv2": _conv_init(ks[1], 3, 28, 48), "prelu2": _prelu_init(48),
            "conv3": _conv_init(ks[2], 2, 48, 64), "prelu3": _prelu_init(64),
            "dense4": _dense_init(ks[3], 576, 128), "prelu4": _prelu_init(128),
            "dense5_1": _dense_init(ks[4], 128, 2),
            "dense5_2": _dense_init(ks[5], 128, 4),
        }

    def apply(self, p: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = _prelu(p["prelu1"], L.conv2d(p["conv1"], x))
        x = _ceil_pool(x, 3, 2)
        x = _prelu(p["prelu2"], L.conv2d(p["conv2"], x))
        x = _ceil_pool(x, 3, 2)
        x = _prelu(p["prelu3"], L.conv2d(p["conv3"], x))
        x = _prelu(p["prelu4"], L.linear(p["dense4"], _facenet_flatten(x)))
        probs = jax.nn.softmax(L.linear(p["dense5_1"], x), axis=-1)
        reg = L.linear(p["dense5_2"], x)
        return probs, reg


class ONet:
    """Output net on 48×48 crops; also regresses 5 landmarks."""

    def init(self, rng) -> Params:
        ks = jax.random.split(rng, 8)
        return {
            "conv1": _conv_init(ks[0], 3, 3, 32), "prelu1": _prelu_init(32),
            "conv2": _conv_init(ks[1], 3, 32, 64), "prelu2": _prelu_init(64),
            "conv3": _conv_init(ks[2], 3, 64, 64), "prelu3": _prelu_init(64),
            "conv4": _conv_init(ks[3], 2, 64, 128), "prelu4": _prelu_init(128),
            "dense5": _dense_init(ks[4], 1152, 256), "prelu5": _prelu_init(256),
            "dense6_1": _dense_init(ks[5], 256, 2),
            "dense6_2": _dense_init(ks[6], 256, 4),
            "dense6_3": _dense_init(ks[7], 256, 10),
        }

    def apply(self, p: Params, x: jnp.ndarray):
        x = _prelu(p["prelu1"], L.conv2d(p["conv1"], x))
        x = _ceil_pool(x, 3, 2)
        x = _prelu(p["prelu2"], L.conv2d(p["conv2"], x))
        x = _ceil_pool(x, 3, 2)
        x = _prelu(p["prelu3"], L.conv2d(p["conv3"], x))
        x = _ceil_pool(x, 2, 2)
        x = _prelu(p["prelu4"], L.conv2d(p["conv4"], x))
        x = _prelu(p["prelu5"], L.linear(p["dense5"], _facenet_flatten(x)))
        probs = jax.nn.softmax(L.linear(p["dense6_1"], x), axis=-1)
        reg = L.linear(p["dense6_2"], x)
        landmarks = L.linear(p["dense6_3"], x)
        return probs, reg, landmarks


# ---------------------------------------------------------------------------
# fixed-size masked NMS (TPU-friendly: O(K²) matrix form, no dynamic shapes)
# ---------------------------------------------------------------------------


def masked_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float = 0.5) -> jnp.ndarray:
    """Greedy NMS over a fixed K-slot buffer.

    ``boxes`` (K, 4) xyxy, ``scores`` (K,), ``valid`` (K,) bool.
    Returns the kept mask (K,) bool. Greedy order = descending score,
    realised as a scan over score-sorted indices with a suppression mask —
    identical results to classic NMS, but shape-static.
    """
    K = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)

    def body(keep, i):
        # keep i iff valid and not suppressed by an already-kept earlier box
        suppressed = jnp.any(keep & (iou[i, :] > iou_threshold)
                             & (jnp.arange(K) < i))
        k = v[i] & ~suppressed
        return keep.at[i].set(k), None

    keep_sorted, _ = jax.lax.scan(body, jnp.zeros(K, bool), jnp.arange(K))
    # unsort back to the input order
    keep = jnp.zeros(K, bool).at[order].set(keep_sorted)
    return keep


# ---------------------------------------------------------------------------
# full cascade
# ---------------------------------------------------------------------------


class MTCNN:
    """Single-image face detection with static shapes throughout.

    ``detect(params, image)`` → (boxes (K,4) xyxy, scores (K,), valid (K,)).
    """

    def __init__(self, image_size: Tuple[int, int], min_face_size: int = 20,
                 thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7),
                 factor: float = 0.709, max_proposals: int = 256,
                 max_refined: int = 64, max_faces: int = 16):
        self.image_size = image_size
        self.thresholds = thresholds
        self.max_proposals = max_proposals
        self.max_refined = max_refined
        self.max_faces = max_faces
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        # static pyramid scales
        H, W = image_size
        m = 12.0 / min_face_size
        min_side = min(H, W) * m
        scales: List[float] = []
        while min_side >= 12:
            scales.append(m)
            m *= factor
            min_side *= factor
        self.scales = scales

    def init(self, rng) -> Params:
        k1, k2, k3 = jax.random.split(rng, 3)
        return {"pnet": self.pnet.init(k1), "rnet": self.rnet.init(k2),
                "onet": self.onet.init(k3)}

    # -- stage helpers --------------------------------------------------------

    def _pnet_proposals(self, p, img):
        """Run P-Net over the pyramid; collect top-K proposals (xyxy+score)."""
        H, W = self.image_size
        all_boxes, all_scores = [], []
        for scale in self.scales:
            sh, sw = max(12, int(H * scale)), max(12, int(W * scale))
            scaled = jax.image.resize(img, (sh, sw, 3), "linear")
            probs, reg = self.pnet.apply(p["pnet"], scaled[None])
            score = probs[0, :, :, 1]                    # (h, w)
            dx1, dy1, dx2, dy2 = jnp.moveaxis(reg[0], -1, 0)
            h, w = score.shape
            ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            stride, cell = 2.0, 12.0
            x1 = (xs * stride + 1) / scale
            y1 = (ys * stride + 1) / scale
            x2 = (xs * stride + cell) / scale
            y2 = (ys * stride + cell) / scale
            bw, bh = x2 - x1, y2 - y1
            boxes = jnp.stack([x1 + dx1 * bw, y1 + dy1 * bh,
                               x2 + dx2 * bw, y2 + dy2 * bh], axis=-1)
            all_boxes.append(boxes.reshape(-1, 4))
            all_scores.append(score.reshape(-1))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = scores > self.thresholds[0]
        k = min(self.max_proposals, scores.shape[0])
        top_scores, idx = jax.lax.top_k(jnp.where(valid, scores, -jnp.inf), k)
        top_boxes = boxes[idx]
        top_valid = top_scores > self.thresholds[0]
        keep = masked_nms(top_boxes, top_scores, top_valid, 0.7)
        return top_boxes, jnp.where(keep, top_scores, -jnp.inf), keep

    def _crop_batch(self, img, boxes, size: int):
        """Gather square crops for each box, resized to (size, size)."""
        H, W = self.image_size
        # square-ify (like facenet's rerec)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        side = jnp.maximum(w, h)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        x1 = cx - side / 2
        y1 = cy - side / 2

        def one(x1i, y1i, si):
            scale = size / jnp.maximum(si, 1.0)
            return jax.image.scale_and_translate(
                img, (size, size, 3), (0, 1),
                jnp.stack([scale, scale]),
                jnp.stack([-y1i * scale, -x1i * scale]), "linear")

        return jax.vmap(one)(x1, y1, side), jnp.stack(
            [x1, y1, x1 + side, y1 + side], axis=-1)

    @staticmethod
    def _apply_reg(boxes, reg):
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        return jnp.stack([boxes[:, 0] + reg[:, 0] * w,
                          boxes[:, 1] + reg[:, 1] * h,
                          boxes[:, 2] + reg[:, 2] * w,
                          boxes[:, 3] + reg[:, 3] * h], axis=-1)

    # -- full pipeline --------------------------------------------------------

    def detect(self, params: Params, image: jnp.ndarray):
        """``image``: (H, W, 3) uint8/float [0,255].

        Returns (boxes (max_faces, 4), scores (max_faces,), valid mask).
        """
        img = (image.astype(jnp.float32) - 127.5) / 128.0

        boxes, scores, valid = self._pnet_proposals(params, img)
        # stage 2: R-Net on top max_refined survivors
        k2 = min(self.max_refined, boxes.shape[0])
        s2, idx2 = jax.lax.top_k(jnp.where(valid, scores, -jnp.inf), k2)
        b2 = boxes[idx2]
        crops, sq2 = self._crop_batch(img, b2, 24)
        probs, reg = self.rnet.apply(params["rnet"], crops)
        rs = probs[:, 1]
        rvalid = (rs > self.thresholds[1]) & jnp.isfinite(s2)
        rb = self._apply_reg(sq2, reg)
        keep = masked_nms(rb, rs, rvalid, 0.7)

        # stage 3: O-Net on top max_faces survivors
        k3 = min(self.max_faces, rb.shape[0])
        s3, idx3 = jax.lax.top_k(jnp.where(keep, rs, -jnp.inf), k3)
        b3 = rb[idx3]
        crops3, sq3 = self._crop_batch(img, b3, 48)
        probs3, reg3, _ = self.onet.apply(params["onet"], crops3)
        os_ = probs3[:, 1]
        ovalid = (os_ > self.thresholds[2]) & jnp.isfinite(s3)
        ob = self._apply_reg(sq3, reg3)
        okeep = masked_nms(ob, os_, ovalid, 0.7)
        return ob, jnp.where(okeep, os_, 0.0), okeep


def import_facenet_weights(sd: Dict[str, np.ndarray]) -> Params:
    """Map a facenet-pytorch MTCNN ``state_dict`` (keys like
    ``pnet.conv1.weight`` or split per-net dicts) onto our param tree.
    Conv kernels transpose OIHW→HWIO; dense and prelu pass through."""
    out: Params = {"pnet": {}, "rnet": {}, "onet": {}}
    for key, arr in sd.items():
        parts = key.split(".")
        net = parts[0] if parts[0] in ("pnet", "rnet", "onet") else None
        if net is None:
            continue
        layer, leaf = parts[1], parts[2]
        a = np.asarray(arr)
        if a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))
        out[net].setdefault(layer, {})[leaf] = jnp.asarray(a)
    return out
