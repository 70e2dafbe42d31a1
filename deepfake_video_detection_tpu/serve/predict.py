"""Serving inference engine: ``predict_video`` with the reference's exact
result-dict schema and decision policy.

Capability parity with ``predict_video`` (``app.py:2027-2321``):

* pretrained/ensemble path — extract ≤ ``MAX_FRAMES`` faces, ``MIN_FACES``
  gate → abstain; normalize; one jitted forward; threshold from
  ``calibration_best.json`` / ``DETECT_FAKE_THRESHOLD`` / 0.5 with the
  extreme-threshold guard (``:2096-2110``); optional EnhancedDecisionAgent
  over per-member logits with std-uncertainty (``:2119-2171``);
  borderline-margin and low-confidence abstains (``:2173-2210``);
* legacy path — pad/sample to 16 frames, chain adjacency for ``vit_gcn`` or
  plain forward for ``cnn_lstm`` (``:2225-2256``).

Result keys: prediction, verdict_yes_no, description, pred_class, confidence,
prob_real, prob_fake, num_faces, threshold, enhanced_agent, abstained.

TPU-native: the forward (normalize + backbone + head, and member forwards
for the agent) is ONE jitted program; the face pipeline feeds device-resident
uint8; host code only applies thresholds to the tiny prob vector.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
from typing import Any, Dict, Optional

# `with self._extract_sem or _NULL_CTX:` — no-op when admission control is
# disabled (SERVE_EXTRACT_CONCURRENCY=0)
_NULL_CTX = contextlib.nullcontext()

import numpy as np

from deepfake_video_detection_tpu.data.dataset import pad_or_sample_frames
from deepfake_video_detection_tpu.data.faces import FaceExtractor
from deepfake_video_detection_tpu.utils.config import env_float, env_int, env_bool, env_str
from deepfake_video_detection_tpu.utils.graph import chain_adjacency, normalize_adjacency

logger = logging.getLogger(__name__)


def _get_fake_class_index(num_classes: int = 2) -> int:
    idx = env_int("FAKE_CLASS_INDEX", 1)
    return idx if idx in (0, 1) and num_classes == 2 else (1 if num_classes == 2 else 0)


def load_calibration(checkpoint_path: Optional[str]) -> Optional[dict]:
    """The full ``calibration_best.json`` next to the checkpoint (threshold
    keys ≙ ``_load_calibration_threshold``, ``app.py:1783-1799``; plus the
    first-party ``real_score_quantiles`` used by ``windowed_threshold``)."""
    if not checkpoint_path:
        return None
    cal = os.path.join(os.path.dirname(checkpoint_path), "calibration_best.json")
    if not os.path.exists(cal):
        return None
    try:
        with open(cal) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def load_calibration_threshold(checkpoint_path: Optional[str]) -> Optional[float]:
    """``calibration_best.json`` next to the checkpoint
    (≙ ``_load_calibration_threshold``, ``app.py:1783-1799``)."""
    data = load_calibration(checkpoint_path)
    if not data:
        return None
    try:
        thr = data.get("best_thr_accuracy", data.get("best_thr_f1"))
        return float(thr) if thr is not None else None
    except (TypeError, ValueError):
        return None


def windowed_threshold(thr: float, windows: int, quantiles) -> float:
    """Order-statistics (Šidák) correction for max-of-W scan verdicts.

    The calibrated threshold ``thr`` was fit on SINGLE-span scores; a
    windowed scan thresholds the MAX of ``windows`` scores, so a real
    video's false-positive odds inflate with W (docs/serving.md r4 caveat —
    closed in r5). With the empirical CDF F of real-class scores
    (``real_score_quantiles`` from calibration): the single-span FPR is
    α = 1 − F(thr); keeping the per-VIDEO FPR at α under W approximately
    independent window draws needs per-window α' = 1 − (1−α)^(1/W), i.e.
    threshold F⁻¹(1 − α'). Returns max(thr, corrected) — the correction
    only ever raises the bar. Falls back to ``thr`` unchanged when no
    quantiles were recorded (pre-r5 calibration artifacts)."""
    if windows <= 1 or not quantiles:
        return thr
    q = np.maximum.accumulate(np.asarray(quantiles, np.float64))
    if q.size < 2:
        return thr
    ps = np.linspace(0.0, 1.0, q.size)
    alpha = 1.0 - float(np.interp(thr, q, ps))
    if alpha <= 0.0:
        return thr  # thr already above every real score seen in validation
    alpha_w = 1.0 - (1.0 - alpha) ** (1.0 / windows)
    return max(thr, float(np.interp(1.0 - alpha_w, ps, q)))


def _detection_threshold(default: float) -> float:
    return env_float("DETECT_FAKE_THRESHOLD", default)


def make_forward_fns(model: Any, is_ensemble: bool, face_size: int):
    """The serving forward for the pretrained/ensemble/temporal family, as
    pure functions of ``(variables, input)`` — shared by :class:`Predictor`
    (which jits them, optionally DP-sharded) and ``tools/export_serving.py``
    (which AOT-exports them to a StableHLO artifact).

    Returns ``(fwd, fwd_yuv)``; both map to
    ``(probs, logits, frame_scores, member_logits)``. ``fwd`` takes uint8
    RGB frames (B, T, H, W, 3); ``fwd_yuv`` takes packed YUV420 crops
    (B, T, face_size*face_size*3//2) — half the host→device bytes, the
    single-chip serving bottleneck (docs/performance.md); the colorspace
    matrix fuses into normalize + the backbone stem on device."""
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
    from deepfake_video_detection_tpu.ops.yuv import yuv420_packed_to_rgb

    def head(v, x):
        if is_ensemble:
            (logits, scores, member_logits), _ = model.apply(
                v, x, train=False, return_member_logits=True)
        else:
            (logits, scores), _ = model.apply(v, x, train=False)
            member_logits = None
        return (jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                logits, scores, member_logits)

    def fwd(v, frames_u8):
        return head(v, imagenet_normalize(frames_u8))

    def fwd_yuv(v, packed_u8):
        rgb = yuv420_packed_to_rgb(packed_u8, face_size, face_size)
        return head(v, imagenet_normalize(rgb / 255.0, scaled=True))

    return fwd, fwd_yuv


class Predictor:
    """Holds the loaded model + jitted forwards; thread-safe for reads."""

    def __init__(self, model: Any, variables: Dict[str, Any], model_type: str,
                 checkpoint_path: Optional[str] = None,
                 enhanced_agent: Optional[Any] = None,
                 extractor: Optional[FaceExtractor] = None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.model_type = model_type
        self.checkpoint_path = checkpoint_path
        self.enhanced_agent = enhanced_agent
        self.extractor = extractor or FaceExtractor()
        self._variables = None  # placed below (plain or DP-replicated, once)

        is_ensemble = model_type == "ensemble_pretrained" or hasattr(model, "members")

        if model_type in ("pretrained", "ensemble_pretrained", "temporal"):
            size = self.extractor.face_size
            fwd_impl, fwd_yuv_impl = make_forward_fns(model, is_ensemble, size)

            # serving data-parallelism: with more than one chip (and
            # micro-batching on, which guarantees mesh-divisible batches),
            # the coalesced request batch shards over a `data` mesh axis and
            # every member forward runs SPMD — XLA inserts the collectives.
            n_dp = 1
            self._n_dp = 1
            use_batcher = env_bool("SERVE_MICROBATCH", True)
            if use_batcher and env_bool("SERVE_DP", True) \
                    and len(jax.devices()) > 1:
                from deepfake_video_detection_tpu.parallel.mesh import (
                    MeshSpec, batch_sharding, make_mesh, replicated_sharding)

                mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
                n_dp = int(mesh.shape["data"])
                self._n_dp = n_dp
                repl = replicated_sharding(mesh)
                self._variables = jax.device_put(variables, repl)  # one put
                shardings = (repl, batch_sharding(mesh))
                fwd = jax.jit(fwd_impl, in_shardings=shardings)
                fwd_yuv = jax.jit(fwd_yuv_impl, in_shardings=shardings)
            else:
                fwd = jax.jit(fwd_impl)
                fwd_yuv = jax.jit(fwd_yuv_impl)

            self._forward = fwd
            self._forward_yuv = fwd_yuv

            # dynamic micro-batching: concurrent requests coalesce into one
            # batched device step (serve/batcher.py). The lambdas are bound
            # once so the batcher can group calls by function identity.
            self._batcher = None
            if use_batcher:
                from deepfake_video_detection_tpu.serve.batcher import MicroBatcher

                self._batcher = MicroBatcher(
                    max_batch=max(1, env_int("SERVE_MICROBATCH_MAX", 16)),
                    max_wait_s=env_float("SERVE_MICROBATCH_WAIT_MS", 4.0) / 1e3,
                    bucket_multiple=n_dp)
                self._fwd_item = lambda stacked: fwd(self._variables, stacked)
                self._fwd_yuv_item = lambda stacked: fwd_yuv(self._variables,
                                                             stacked)
        elif model_type == "cnn_lstm":
            @jax.jit
            def fwd(v, frames_u8):
                # legacy models trained on [0,1] frames (no ImageNet stats)
                x = frames_u8.astype(jnp.float32) / 255.0
                logits, _ = self.model.apply(v, x, train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            self._forward = fwd
        else:  # vit_gcn
            @jax.jit
            def fwd(v, frames_u8, A):
                x = frames_u8.astype(jnp.float32) / 255.0
                logits, _ = self.model.apply(v, x, A, train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            self._forward = fwd

        if self._variables is None:  # non-DP paths: plain single placement
            self._variables = jax.device_put(variables)

        # input-gradient saliency (serve/saliency.py) — built lazily on the
        # first explain request (or in warmup when SERVE_EXPLAIN_WARMUP=1):
        # most deployments never pay its compile. One compiled program per
        # fake-class index, so a runtime FAKE_CLASS_INDEX change explains
        # the RIGHT class instead of the one frozen at first trace.
        import threading as _threading

        self._saliency_fns: Dict[int, Any] = {}
        self._saliency_lock = _threading.Lock()

        # Admission control for the CPU-bound extraction stage (decode +
        # face detection). Under heavy client concurrency every request
        # thread used to run its own GIL-free extraction at once; on a
        # small host they thrash instead of queueing — measured on the
        # 1-core TPU host: 16 HTTP clients with the haar detector
        # COLLAPSED aggregate throughput 4.4 → 1.4 clips/s with p95 18 s
        # (docs/serving.md). Bounding in-flight extractions keeps the
        # stage at its serial-optimal rate and turns the overload into
        # orderly queueing. SERVE_EXTRACT_CONCURRENCY overrides (0 = off).
        n_ex = env_int("SERVE_EXTRACT_CONCURRENCY",
                       max(2, (os.cpu_count() or 1)))
        self._extract_sem = (_threading.BoundedSemaphore(n_ex)
                             if n_ex > 0 else None)

        # startup warmup (default on): compile the serving forward at the
        # configured shape in a background thread so the FIRST user request
        # doesn't pay the jit cost (minutes for a real backbone on a cold
        # cache). Runs after __init__ returns; failures are non-fatal.
        import threading

        # set when the background warmup finishes (immediately if disabled)
        # — a deterministic completion signal for tests/operators instead of
        # polling the compile-call stream for quiescence
        self.warmup_done = threading.Event()
        if env_bool("SERVE_WARMUP", True) and model_type in (
                "pretrained", "ensemble_pretrained", "temporal"):
            threading.Thread(target=self.warmup, name="predictor-warmup",
                             daemon=True).start()
        else:
            self.warmup_done.set()

    def warmup(self) -> None:
        """Compile-and-run the production forward on a dummy batch."""
        try:
            import jax
            import jax.numpy as jnp

            T = max(1, min(64, env_int("MAX_FRAMES", 8)))
            size = self.extractor.face_size
            n_dp = getattr(self, "_n_dp", 1)
            yuv = (self.extractor.detector in ("center", "haar")
                   and not self.extractor.keep_all
                   and env_bool("SERVE_YUV_TRANSFER", True))
            # the windowed-scan path (SERVE_WINDOWS>1) runs its own
            # (w_pad, T) batch shape — pre-compile it too so the first
            # long-video request doesn't pay full jit cost
            windows = max(1, min(64, env_int("SERVE_WINDOWS", 1)))
            batch_sizes = [n_dp]
            if windows > 1:
                batch_sizes.append(-(-windows // n_dp) * n_dp)
            if getattr(self, "_batcher", None) is not None:
                # pre-compile every power-of-two micro-batch bucket: under
                # concurrent load the batcher pads to these shapes, and a
                # first-hit compile mid-traffic stalls every waiting
                # request (measured: an un-warmed bucket collapsed the
                # 8-client HTTP benchmark to 2.5 clips/s)
                batch_sizes.extend(self._batcher.bucket_sizes())
            for b in dict.fromkeys(batch_sizes):  # dedupe, keep order
                if yuv:
                    packed = jnp.zeros((b, T, size * size * 3 // 2), jnp.uint8)
                    out = self._forward_yuv(self._variables, packed)
                else:
                    frames = jnp.zeros((b, T, size, size, 3), jnp.uint8)
                    out = self._forward(self._variables, frames)
                jax.block_until_ready(out[0])
            if (env_bool("SERVE_EXPLAIN", True)
                    and env_bool("SERVE_EXPLAIN_WARMUP", False)):
                # pre-compile the saliency program at the serving shape so
                # the first explain request doesn't pay its jit inline in
                # an HTTP worker (minutes through a cold TPU relay). Off by
                # default: it costs a full grad compile at startup that
                # most deployments never use.
                self.explain_faces(np.zeros((T, size, size, 3), np.uint8))
        except Exception:  # warmup must never take the server down
            pass
        finally:
            self.warmup_done.set()

    # ------------------------------------------------------------------

    def predict_video(self, video_path: str,
                      explain: bool = False) -> Dict[str, Any]:
        try:
            return self._predict(video_path, explain=explain)
        except Exception as e:  # the route must always get a dict
            return {"error": str(e)}

    def predict_faces(self, faces: np.ndarray, video_id: str = "video",
                      explain: bool = False) -> Dict[str, Any]:
        """Run the decision policy on pre-extracted face crops."""
        if self.model_type in ("pretrained", "ensemble_pretrained", "temporal"):
            return self._predict_pretrained(faces, video_id, explain=explain)
        return self._predict_legacy(faces)

    def explain_faces(self, faces: np.ndarray) -> Optional[Dict[str, Any]]:
        """Per-frame spatial saliency for ``faces`` (T, H, W, 3) uint8 RGB —
        the additive ``saliency`` result key (``serve/saliency.py``). None
        for model families outside the pretrained/temporal serving forward.

        ``FAKE_CLASS_INDEX`` is resolved on the host PER CALL and selects a
        per-index compiled program, so a runtime env change switches the
        explained class just like it switches the verdict path."""
        if self.model_type not in ("pretrained", "ensemble_pretrained",
                                   "temporal"):
            return None
        import jax

        from deepfake_video_detection_tpu.serve.saliency import (
            make_saliency_fn, saliency_payload)

        n_classes = int(getattr(self.model, "num_classes", 2))
        fake_idx = _get_fake_class_index(n_classes)
        with self._saliency_lock:
            fn = self._saliency_fns.get(fake_idx)
            if fn is None:
                fn = self._saliency_fns[fake_idx] = jax.jit(
                    make_saliency_fn(self.model, fake_idx=fake_idx))
        grids = fn(self._variables, np.asarray(faces)[None])
        return saliency_payload(np.asarray(grids)[0])

    # ------------------------------------------------------------------

    @staticmethod
    def _pad_to_fixed_scan_shape(faces: np.ndarray, windows: int,
                                 total: int) -> np.ndarray:
        """Cycle-pad an under-length scan extraction up to ``total`` frames
        so the windowed forward always compiles ONE shape,
        (windows, MAX_FRAMES, ...) — every distinct extracted-frame count
        would otherwise be a fresh XLA program (minutes through the TPU
        relay). Clips below ``MIN_FACES`` are passed through unpadded so
        the abstain gate still sees the true frame count."""
        n = int(faces.shape[0])
        if windows <= 1 or n >= total or n < max(1, env_int("MIN_FACES", 2)):
            return faces
        return faces[np.arange(total) % n]

    def _predict(self, video_path: str,
                 explain: bool = False) -> Dict[str, Any]:
        # SERVE_EXPLAIN (default on) gates the explain surface: explain is
        # reachable on the unauthenticated /api/predict and roughly doubles
        # per-request FLOPs (plus a first-hit saliency compile), so an
        # operator can switch it off without touching clients. Gating HERE
        # also stops a disabled explain flag from forcing the RGB slow path.
        explain = explain and env_bool("SERVE_EXPLAIN", True)
        if self.model_type in ("pretrained", "ensemble_pretrained", "temporal"):
            max_frames = max(1, min(64, env_int("MAX_FRAMES", 8)))
            # long-video scanning (beyond parity — the reference analyses one
            # ≤MAX_FRAMES span, app.py:2050): with SERVE_WINDOWS=W > 1 the
            # sampler spreads W*T frames over the whole clip, the detector
            # runs ONE batched forward over the W temporal windows, and the
            # verdict comes from the most-suspicious window (max prob_fake) —
            # a localized manipulation anywhere in a long video is caught.
            windows = max(1, min(64, env_int("SERVE_WINDOWS", 1)))
            total = max_frames * windows
            if (self.extractor.detector in ("center", "haar") and not explain
                    and not self.extractor.keep_all
                    and env_bool("SERVE_YUV_TRANSFER", True)):
                # (KEEP_ALL_FACES stays on the RGB path: the in-decoder
                # haar pipeline is largest-face only)
                # (explain requests take the RGB path below: saliency
                # differentiates the RGB serving forward)
                # production fast path (what bench.py measures): packed
                # YUV420 over the host→device link, RGB on device; for haar
                # the detection itself runs in-decoder on the luma plane
                # (data/faces.py extract_from_video_yuv)
                with self._extract_sem or _NULL_CTX:
                    packed = self.extractor.extract_from_video_yuv(
                        video_path, max_frames=total)
                if packed.shape[0] == 0:
                    return {"error": "No faces detected in video"}
                n_extracted = int(packed.shape[0])
                packed = self._pad_to_fixed_scan_shape(packed, windows, total)
                return self._predict_pretrained(
                    packed, os.path.basename(video_path), packed_yuv=True,
                    windows=windows, n_extracted=n_extracted)
            with self._extract_sem or _NULL_CTX:
                faces = self.extractor.extract_from_video(
                    video_path, max_frames=total, spread=windows > 1)
            if faces.shape[0] == 0:
                return {"error": "No faces detected in video"}
            n_extracted = int(faces.shape[0])
            faces = self._pad_to_fixed_scan_shape(faces, windows, total)
            return self._predict_pretrained(faces, os.path.basename(video_path),
                                            windows=windows,
                                            n_extracted=n_extracted,
                                            explain=explain)
        with self._extract_sem or _NULL_CTX:
            faces = self.extractor.extract_from_video(video_path)
        if faces.shape[0] == 0:
            return {"error": "No faces detected in video"}
        return self._predict_legacy(faces)

    def _predict_pretrained(self, faces: np.ndarray, video_id: str,
                            packed_yuv: bool = False,
                            windows: int = 1,
                            n_extracted: Optional[int] = None,
                            explain: bool = False
                            ) -> Dict[str, Any]:
        import jax.numpy as jnp

        abstain_conf = env_float("DETECT_ABSTAIN_CONF", 0.60)
        abstain_margin = max(0.0, min(0.5, env_float("DETECT_ABSTAIN_MARGIN", 0.0)))
        # report the number of faces actually extracted from the clip, not
        # the cycle-padded static-shape count the forward pass sees
        num_faces = int(faces.shape[0]) if n_extracted is None else n_extracted
        min_faces = max(1, env_int("MIN_FACES", 2))
        if num_faces < min_faces:
            return {
                "prediction": "Uncertain", "verdict_yes_no": "Unsure",
                "description": (
                    f"Not enough faces/frames detected for a stable decision "
                    f"(num_faces={num_faces}, min_faces={min_faces}). Try a "
                    f"clearer face shot, better lighting, or a longer clip."),
                "pred_class": None, "confidence": None, "prob_real": None,
                "prob_fake": None, "num_faces": num_faces, "abstained": True,
            }

        win_payload = None
        if windows > 1:
            # windowed scan: one batched forward over (W, T, ...) — the
            # windows ARE the batch, so this bypasses the request batcher
            T = max(1, -(-faces.shape[0] // windows))  # ceil: keep the tail
            need = windows * T
            if faces.shape[0] < need:  # repeat-pad short clips
                pad = np.repeat(faces[-1:], need - faces.shape[0], axis=0)
                faces = np.concatenate([faces, pad])
            faces_w = np.asarray(faces[:need]).reshape(
                (windows, T) + faces.shape[1:])
            # under serving DP the batch (window) axis must divide the mesh:
            # repeat-pad windows, slice the padded outputs back below
            n_dp = getattr(self, "_n_dp", 1)
            w_pad = -(-windows // n_dp) * n_dp
            if w_pad > windows:
                faces_w = np.concatenate(
                    [faces_w, np.repeat(faces_w[-1:], w_pad - windows, 0)])
            fwd = self._forward_yuv if packed_yuv else self._forward
            probs, logits, frame_scores, member_logits = fwd(
                self._variables, jnp.asarray(faces_w))
            probs = probs[:windows]
            logits = logits[:windows]
            frame_scores = frame_scores[:windows]
            if member_logits is not None:
                member_logits = member_logits[:, :windows]
        elif getattr(self, "_batcher", None) is not None:
            # coalesce with concurrent requests into one device step; each
            # output comes back as this request's length-1 slice, so the
            # [0]-indexing below matches the unbatched path (member logits
            # are (M, B, C): batch axis 1)
            item_fn = self._fwd_yuv_item if packed_yuv else self._fwd_item
            probs, logits, frame_scores, member_logits = self._batcher.call(
                item_fn, np.asarray(faces), out_axes=(0, 0, 0, 1))
        else:
            fwd = self._forward_yuv if packed_yuv else self._forward
            probs, logits, frame_scores, member_logits = fwd(
                self._variables, jnp.asarray(faces)[None])
        probs_all = np.asarray(probs)          # (W or 1, C)
        fake_idx = _get_fake_class_index(probs_all.shape[1])
        # verdict from the most-suspicious window (max prob_fake): a fake
        # segment anywhere in a long clip flags the whole video
        widx = int(np.argmax(probs_all[:, fake_idx])) \
            if probs_all.shape[0] > 1 else 0
        if windows > 1:
            win_payload = {
                "policy": "max", "count": int(probs_all.shape[0]),
                "deciding_window": widx,
                "prob_fake": [round(float(p), 6)
                              for p in probs_all[:, fake_idx]],
            }
            if num_faces < need:
                # detector dropped undetected frames and the remainder was
                # cycle-padded (_pad_to_fixed_scan_shape): window i no
                # longer covers the i-th uniform time segment — say so
                # rather than let a consumer localize a fake from the index
                win_payload["temporal_alignment"] = "cycled"
                win_payload["note"] = (
                    "some sampled frames had no detected face and were "
                    "dropped before cycle-padding; window indices are "
                    "approximate, not uniform time segments")
            else:
                win_payload["temporal_alignment"] = "exact"
        probs = probs_all[widx]
        real_idx = 1 - fake_idx if probs.shape[0] == 2 else 0
        prob_fake = float(probs[fake_idx])
        prob_real = float(probs[real_idx])

        thr = load_calibration_threshold(self.checkpoint_path)
        thr = 0.5 if thr is None else float(thr)
        thr = float(_detection_threshold(thr))
        if not env_bool("ALLOW_EXTREME_CALIBRATION_THRESHOLD") and \
                (thr < 0.05 or thr > 0.95):
            thr = 0.5
        if windows > 1 and env_bool("SERVE_WINDOW_CAL", True):
            # max-of-W inflates real-video FPR at the single-span threshold;
            # correct via the calibration artifact's real-score CDF
            cal = load_calibration(self.checkpoint_path) or {}
            thr_w = windowed_threshold(thr, int(probs_all.shape[0]),
                                       cal.get("real_score_quantiles"))
            if win_payload is not None:
                win_payload["threshold_correction"] = {
                    "method": ("order-statistics over the calibration "
                               "real-score quantiles"
                               if thr_w != thr else "unavailable"),
                    "base": round(float(thr), 6),
                    "effective": round(float(thr_w), 6),
                }
            thr = thr_w
        is_fake = prob_fake >= thr
        pred_class = 1 if is_fake else 0
        confidence = prob_fake if is_fake else prob_real
        description = (f"Ensemble pretrained detector (thr={thr:.2f})"
                       if self.model_type == "ensemble_pretrained"
                       else f"Pretrained detector (thr={thr:.2f})")

        agent_payload = None
        if (not env_bool("DISABLE_ENHANCED_AGENT")
                and self.enhanced_agent is not None
                and member_logits is not None):
            member_np = np.asarray(member_logits)[:, widx]  # (M, C)
            x = member_np - member_np.max(-1, keepdims=True)
            member_probs = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
            ind = member_probs[:, fake_idx]
            uncertainty = float(np.std(ind)) if ind.shape[0] >= 2 else 0.0
            try:
                # per-call overrides (not attribute mutation): the agent is
                # shared across the ThreadingWSGIServer's request threads
                pred = self.enhanced_agent.process_ensemble_output(
                    np.asarray(logits)[widx], list(member_np),
                    np.asarray(frame_scores)[widx], video_id, uncertainty,
                    decision_threshold=thr, fake_class_index=fake_idx)
                agent_payload = {
                    "is_fake": bool(pred.is_fake) if pred.is_fake is not None else None,
                    "ensemble_prob": float(pred.ensemble_prob),
                    "confidence": float(pred.confidence),
                    "alert_level": pred.alert_level.name,
                    "uncertainty": float(pred.uncertainty),
                    "explanation": pred.explanation,
                }
                description = agent_payload["explanation"] or description
                if pred.is_fake is not None:
                    pred_class = int(pred.is_fake)
                confidence = float(agent_payload["confidence"])
            except Exception:
                agent_payload = None

        base = {"prob_real": prob_real, "prob_fake": prob_fake,
                "num_faces": num_faces, "threshold": thr,
                "enhanced_agent": agent_payload,
                # additive key (reference schema untouched): the temporal
                # attention weights of the deciding window — which sampled
                # frames drove the verdict (rendered as the result page's
                # per-frame strip; sums to ~1 over the T frames)
                "frame_scores": [round(float(s), 4)
                                 for s in np.asarray(frame_scores)[widx]]}
        if win_payload is not None:
            base["windows"] = win_payload
        if explain and not packed_yuv:
            # spatial explanation of the DECIDING window (serve/saliency.py);
            # rides through the abstain returns below via **base so uncertain
            # verdicts still show where the detector looked
            try:
                sal = self.explain_faces(
                    faces_w[widx] if windows > 1 else np.asarray(faces))
                if sal is not None:
                    if self.extractor.detector in ("center", "haar"):
                        # the non-explain verdict for these detectors rides
                        # the packed-YUV420 fast path; explain re-extracts
                        # via RGB, whose chroma handling differs slightly —
                        # near the threshold the two pipelines can score a
                        # clip marginally differently (advisor r3)
                        sal["pipeline_note"] = (
                            "saliency explains the RGB extraction pipeline; "
                            "non-explain verdicts use the packed-YUV420 "
                            "path, which may differ marginally near the "
                            "decision threshold")
                    base["saliency"] = sal
            except Exception:
                logger.exception("saliency explain failed for %s", video_id)
        if abstain_margin > 0.0 and abs(prob_fake - thr) <= abstain_margin:
            return {
                "prediction": "Uncertain", "verdict_yes_no": "Unsure",
                "description": (
                    f"Borderline score (prob_fake={prob_fake * 100:.1f}%, "
                    f"thr={thr:.2f} ± {abstain_margin:.2f}). Manual review "
                    f"recommended.\n\n" + description),
                "pred_class": None, "confidence": float(confidence),
                "abstained": True, **base,
            }
        if confidence < abstain_conf:
            return {
                "prediction": "Uncertain", "verdict_yes_no": "Unsure",
                "description": (
                    f"Low confidence ({confidence * 100:.1f}%). This video may "
                    f"be out-of-domain (different compression, face quality, "
                    f"lighting, or manipulation type). Manual review "
                    f"recommended.\n\n" + description),
                "pred_class": None, "confidence": float(confidence),
                "abstained": True, **base,
            }
        return {
            "prediction": "Deepfake" if pred_class == 1 else "Real",
            "verdict_yes_no": "Yes" if pred_class == 1 else "No",
            "description": description, "pred_class": pred_class,
            "confidence": float(confidence), **base,
        }

    def _predict_legacy(self, faces: np.ndarray) -> Dict[str, Any]:
        import jax.numpy as jnp

        abstain_conf = env_float("DETECT_ABSTAIN_CONF", 0.60)
        abstain_margin = max(0.0, min(0.5, env_float("DETECT_ABSTAIN_MARGIN", 0.0)))
        num_faces = int(faces.shape[0])
        faces = pad_or_sample_frames(faces, 16)

        if self.model_type == "cnn_lstm":
            probs = self._forward(self._variables, jnp.asarray(faces)[None])
        else:
            A = normalize_adjacency(chain_adjacency(16))
            probs = self._forward(self._variables, jnp.asarray(faces)[None],
                                  jnp.asarray(A)[None])
        probs = np.asarray(probs)[0]
        fake_idx = _get_fake_class_index(probs.shape[0])
        real_idx = 1 - fake_idx if probs.shape[0] == 2 else 0
        prob_fake = float(probs[fake_idx])
        prob_real = float(probs[real_idx])
        thr = float(_detection_threshold(0.5))
        is_fake = prob_fake >= thr
        pred_class = 1 if is_fake else 0
        confidence = prob_fake if is_fake else prob_real

        if abstain_margin > 0.0 and abs(prob_fake - thr) <= abstain_margin:
            return {"prediction": "Uncertain", "verdict_yes_no": "Unsure",
                    "description": (
                        f"Borderline score (prob_fake={prob_fake * 100:.1f}%, "
                        f"thr={thr:.2f} ± {abstain_margin:.2f}). Manual review "
                        f"recommended."),
                    "pred_class": None, "confidence": float(confidence),
                    "prob_real": prob_real, "prob_fake": prob_fake,
                    "num_faces": num_faces, "threshold": thr, "abstained": True}
        if confidence < abstain_conf:
            return {"prediction": "Uncertain", "verdict_yes_no": "Unsure",
                    "description": (
                        f"Low confidence ({confidence * 100:.1f}%). This video "
                        f"may be out-of-domain. Manual review recommended."),
                    "pred_class": None, "confidence": float(confidence),
                    "prob_real": prob_real, "prob_fake": prob_fake,
                    "num_faces": num_faces, "abstained": True}
        return {
            "prediction": "Deepfake" if pred_class == 1 else "Real",
            "verdict_yes_no": "Yes" if pred_class == 1 else "No",
            "description": ("Detected indicators of synthetic manipulation in "
                            "facial frames." if pred_class == 1 else
                            "No strong signs of manipulation detected; appears "
                            "authentic."),
            "pred_class": pred_class, "confidence": float(confidence),
            "prob_real": prob_real, "prob_fake": prob_fake,
            "num_faces": num_faces, "threshold": thr,
        }


# ---------------------------------------------------------------------------
# human-readable messaging (≙ app.py:2324-2460)
# ---------------------------------------------------------------------------


def simple_english_message(result: Optional[Dict[str, Any]],
                           filename: Optional[str] = None) -> str:
    """≙ ``_simple_english_message`` (``app.py:2324``)."""
    if not isinstance(result, dict):
        return "Sorry, I could not check this video."
    if result.get("error"):
        return f"Sorry, I could not check this video. Error: {result['error']}"
    name = f" for {filename}" if filename else ""
    if result.get("abstained"):
        return (f"I am not sure about this video{name}. "
                f"Please try a clearer or longer clip.")
    if result.get("pred_class") == 1:
        conf = result.get("confidence")
        pct = f" I am {conf * 100:.0f}% sure." if isinstance(conf, float) else ""
        return f"This video{name} looks FAKE.{pct}"
    conf = result.get("confidence")
    pct = f" I am {conf * 100:.0f}% sure." if isinstance(conf, float) else ""
    return f"This video{name} looks REAL.{pct}"


def ensure_exact_word_count(text: str, target: int = 200) -> str:
    """Pad/trim to exactly ``target`` words (≙ ``_ensure_exact_word_count``,
    ``app.py:2378``)."""
    words = text.split()
    if len(words) > target:
        return " ".join(words[:target])
    filler = ("Please review the result carefully and use your own judgment "
              "when sharing this video with other people online.").split()
    i = 0
    while len(words) < target:
        words.append(filler[i % len(filler)])
        i += 1
    return " ".join(words)


def simple_english_justification_200_words(result: Dict[str, Any],
                                           filename: str = "") -> str:
    """≙ ``_simple_english_justification_200_words`` (``app.py:2414``)."""
    verdict = result.get("prediction", "Uncertain")
    conf = result.get("confidence")
    prob_fake = result.get("prob_fake")
    num_faces = result.get("num_faces", 0)
    parts = [
        f"We checked the video {filename} with our deepfake detector.",
        f"The final verdict is: {verdict}.",
    ]
    if isinstance(conf, float):
        parts.append(f"The system is about {conf * 100:.0f} percent confident "
                     f"in this verdict.")
    if isinstance(prob_fake, float):
        parts.append(f"The model gave a fake probability of "
                     f"{prob_fake * 100:.0f} percent.")
    parts.append(f"We looked at {num_faces} face pictures taken from different "
                 f"moments of the video.")
    parts.append("The detector studies each face for small signs that editing "
                 "tools leave behind, like strange skin texture, blurry edges "
                 "around the face, odd lighting, or eyes and teeth that do not "
                 "look natural.")
    parts.append("It also compares the faces across time, because fake videos "
                 "often flicker or change in ways real videos do not.")
    if result.get("abstained"):
        parts.append("This time the system was not sure enough to give a firm "
                     "answer, so it chose to say it is uncertain instead of "
                     "guessing.")
        parts.append("A clearer video with a bigger, brighter face would help "
                     "it decide.")
    elif result.get("pred_class") == 1:
        parts.append("The signs of editing were strong enough for the system "
                     "to call this video fake.")
        parts.append("Be careful before trusting or sharing it.")
    else:
        parts.append("The system did not find strong signs of editing, so the "
                     "video looks real to it.")
        parts.append("Remember that no detector is perfect, so stay careful "
                     "online.")
    return ensure_exact_word_count(" ".join(parts), 200)
