"""Temporal transformer detector — long-clip model family (beyond parity).

The reference caps clips at 16-64 frames because its temporal fusion is a
tiny MLP/LSTM (SURVEY.md §5.7). This family scales the time axis instead:
per-frame backbone features feed a transformer over the FRAME axis whose
attention runs through the Pallas flash kernel (``ops/attention.py``) on a
single chip, or ``ops/ring_attention.py`` when the frame axis is sharded
across the mesh — exact attention over thousands of frames without ever
materialising the (T, T) matrix.

Interface matches ``BackboneDetector``: ``apply(variables, frames (B,T,H,W,C))
→ ((logits, frame_scores), state)``, so the trainer, evaluator, and serving
loader drive it unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.models.backbone_detector import build_backbone

Params = Dict[str, Any]


def _lin_init(key, out_d, in_d):
    kw, kb = jax.random.split(key)
    return {"weight": I.trunc_normal(kw, (out_d, in_d), std=0.02),
            "bias": I.zeros(out_d)}


def stack_blocks(blocks: Dict[str, Params]) -> Params:
    """Loop layout ``{"0": {...}, "1": {...}}`` → pipeline layout (leaves
    stacked with a leading depth axis). Checkpoints trained in either mode
    convert losslessly through these two helpers."""
    ordered = [blocks[str(i)] for i in range(len(blocks))]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ordered)


def unstack_blocks(stacked: Params) -> Dict[str, Params]:
    """Pipeline layout → loop layout (inverse of ``stack_blocks``)."""
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {str(i): jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(depth)}


def normalize_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Renumber a pipeline-layout FLAT state dict to the canonical loop
    layout.

    A checkpoint trained with ``stage_axis`` stores transformer blocks
    STACKED: keys like ``blocks.attn.qkv.weight`` whose leaves carry a
    leading depth axis (``stack_blocks``). The canonical dotted layout
    mirrors torch keys (``blocks.0.attn...`` — CLAUDE.md convention), so
    every checkpoint consumer (serve loader, evaluator, torch export)
    normalizes through this helper. No-op for loop-layout dicts.
    """
    import numpy as np

    if not any(k.startswith("blocks.") and not k.split(".")[1].isdigit()
               for k in sd):
        return sd
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "blocks" and not parts[1].isdigit():
            arr = np.asarray(v)
            for i in range(arr.shape[0]):
                out[".".join(["blocks", str(i)] + parts[1:])] = arr[i]
        else:
            out[k] = v
    return out


def infer_mlp_kwargs(sd: Dict[str, Any], d_model: int,
                     cfg: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Constructor kwargs to rebuild a checkpoint's block-MLP layout —
    shared by the serve loader and the evaluator so both always
    reconstruct the same architecture from the same checkpoint.

    MoE checkpoints (``--moe_experts``) carry expert-stacked leaves
    ``blocks.i.mlp.w1`` of shape (E, D, H); dense checkpoints carry the
    fc1/fc2 pair. Either way the EXACT hidden width comes from the leaf:
    a float ratio would truncate ``int(d * (h / d))`` to ``h - 1`` for
    many (d_model, hidden) pairs.
    """
    import numpy as np

    cfg = cfg or {}
    w1 = sd.get("blocks.0.mlp.w1")
    if w1 is not None and np.ndim(w1) == 3:
        e, _, h = (int(s) for s in np.shape(w1))
        return {"moe_experts": cfg.get("moe_experts", e), "mlp_hidden": h}
    fc1 = sd.get("blocks.0.mlp.fc1.weight")
    if fc1 is not None and np.ndim(fc1) == 2:
        dims = [int(s) for s in np.shape(fc1)]
        # fc1 maps D -> H; the hidden width is the dim that isn't d_model
        # (if H == D both dims agree, so dims[0] is right either way)
        return {"mlp_hidden": next((s for s in dims if s != d_model),
                                   dims[0])}
    return {}


class TemporalTransformerDetector:
    def __init__(
        self,
        backbone_name: str = "efficientnet_b0",
        num_classes: int = 2,
        d_model: int = 256,
        depth: int = 4,
        num_heads: int = 4,
        mlp_ratio: float = 4.0,
        mlp_hidden: Optional[int] = None,
        dropout_rate: float = 0.1,
        max_frames: int = 4096,
        use_flash: bool = True,
        use_cls: bool = True,
        mesh: Optional[Any] = None,
        seq_axis: Optional[str] = None,
        seq_strategy: str = "ring",
        batch_axis: Optional[str] = "data",
        moe_experts: int = 0,
        expert_axis: Optional[str] = None,
        stage_axis: Optional[str] = None,
        pp_microbatches: int = 2,
        compute_dtype: jnp.dtype = jnp.float32,
    ):
        """``mesh`` + ``seq_axis``: sequence-parallel mode — the frame axis is
        sharded over ``seq_axis`` and every attention runs sequence-parallel.
        ``seq_strategy`` picks the collective pattern: ``"ring"`` rotates KV
        shards over ICI with O(T/ring) memory per chip
        (``ops/ring_attention.py``); ``"ulysses"`` all-to-alls to a
        head-sharded layout and back (``ops/ulysses_attention.py``,
        needs num_heads % seq degree == 0). Both are exact. Requires
        ``use_cls=False`` (T must divide the ring evenly; pooling replaces
        the cls token) and T % mesh.shape[seq_axis] == 0.

        ``moe_experts > 0``: every block's MLP becomes a top-1-routed
        mixture of experts (``nn/moe.py``). With ``mesh`` + ``expert_axis``
        the experts shard over the mesh (expert parallelism); otherwise the
        dense path runs — identical numerics either way.

        ``mesh`` + ``stage_axis``: pipeline-parallel mode — the transformer
        blocks are STACKED (param leaves gain a leading ``depth`` axis, to be
        sharded ``P(stage_axis)`` so each device holds ``depth/S`` blocks)
        and the batch flows through them as ``pp_microbatches`` GPipe
        microbatches (``parallel/pipeline.py``). A pipeline is a schedule,
        not a numerics change — outputs match the sequential loop exactly
        (``tests/test_pipeline.py``). Requires depth % S == 0,
        B % pp_microbatches == 0, dense MLPs (no MoE), and no seq_axis.
        """
        self.backbone = build_backbone(backbone_name, compute_dtype)
        self.backbone_name = backbone_name
        self.feature_dim = self.backbone.feature_dim
        self.num_classes = num_classes
        self.d_model = d_model
        self.depth = depth
        self.num_heads = num_heads
        # explicit mlp_hidden wins: int(d_model * (h / d_model)) can truncate
        # to h-1 in float, so checkpoint loaders pass the exact leaf size
        self.mlp_hidden = (int(mlp_hidden) if mlp_hidden is not None
                           else int(d_model * mlp_ratio))
        self.dropout_rate = dropout_rate
        self.max_frames = max_frames
        self.use_flash = use_flash
        self.use_cls = use_cls
        self.mesh = mesh
        self.seq_axis = seq_axis
        if seq_strategy not in ("ring", "ulysses"):
            raise ValueError(f"unknown seq_strategy {seq_strategy!r}")
        self.seq_strategy = seq_strategy
        self.batch_axis = batch_axis
        if mesh is not None and seq_axis and use_cls:
            raise ValueError("sequence-parallel mode needs use_cls=False "
                             "(the +1 cls token breaks even T sharding)")
        self.expert_axis = expert_axis
        self.moe = None
        if moe_experts:
            from deepfake_video_detection_tpu.nn.moe import MoEMLP
            self.moe = MoEMLP(d_model, self.mlp_hidden, moe_experts)
        self.stage_axis = stage_axis
        self.pp_microbatches = pp_microbatches
        if stage_axis:
            if mesh is None:
                raise ValueError("pipeline-parallel mode needs a mesh")
            if self.moe is not None or seq_axis:
                raise ValueError("stage_axis is mutually exclusive with "
                                 "moe_experts/seq_axis")
            if depth % mesh.shape[stage_axis] != 0:
                raise ValueError(
                    f"depth {depth} must divide over the {stage_axis} axis "
                    f"({mesh.shape[stage_axis]} stages)")
        self.compute_dtype = compute_dtype

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        kb, kp, kcls, *ks = jax.random.split(rng, 4 + 4 * self.depth)
        bvars = self.backbone.init(kb)
        D, H = self.d_model, self.mlp_hidden
        params: Params = {
            "backbone": bvars["params"],
            "proj": _lin_init(kp, D, self.feature_dim),
            "cls_token": I.trunc_normal(kcls, (1, 1, D), std=0.02),
            "blocks": {},
            "norm": {"weight": I.ones(D), "bias": I.zeros(D)},
        }
        it = iter(ks)
        blocks = []
        for i in range(self.depth):
            if self.moe is not None:
                mlp = self.moe.init(jax.random.fold_in(ks[-1], i))
            else:
                mlp = {"fc1": _lin_init(next(it), H, D),
                       "fc2": _lin_init(next(it), D, H)}
            blocks.append({
                "norm1": {"weight": I.ones(D), "bias": I.zeros(D)},
                "attn": {
                    "qkv": _lin_init(next(it), 3 * D, D),
                    "proj": _lin_init(next(it), D, D),
                },
                "norm2": {"weight": I.ones(D), "bias": I.zeros(D)},
                "mlp": mlp,
            })
        if self.stage_axis:
            # pipeline layout: leaves stacked (depth, ...) — shard P(stage).
            # stack_blocks/unstack_blocks convert to/from the loop layout.
            params["blocks"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *blocks)
        else:
            params["blocks"] = {str(i): b for i, b in enumerate(blocks)}
        kh = jax.random.split(ks[-1])[0]
        params["head"] = _lin_init(kh, self.num_classes, D)
        return {"params": params, "state": {"backbone": bvars["state"]}}

    def _attention(self, p: Params, x: jnp.ndarray,
                   train: bool = False) -> jnp.ndarray:
        """Self-attention over frames via the flash kernel when on TPU and
        the sequence is long enough to benefit; XLA softmax path otherwise.

        The flash threshold is MODE-DEPENDENT (measured on hardware, r4):
        in inference the kernel engages from N >= 256 (no (N,N) matrix
        ever materialises); in training — even with the streaming Pallas
        backward — XLA's fused attention is ~1.4x faster wall-clock up to
        N=4096 (1.4/3.3/9.2 vs 2.0/4.2/12.8 ms fwd+bwd at N=1024/2048/
        4096, B*H=16 d=64 bf16), so flash engages at N >= 4096 where the
        XLA backward's (B,H,N,N) f32 score materialisation (>= 1 GB/layer)
        starts to threaten HBM and the O(N) memory profile is the point."""
        B, N, D = x.shape
        nh = self.num_heads
        hd = D // nh
        qkv = L.linear(p["qkv"], x).reshape(B, N, 3, nh, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if self.mesh is not None and self.seq_axis:
            # sequence parallel: frame axis sharded over the mesh; exact
            # attention via the ppermute KV ring or the Ulysses all-to-all
            if self.seq_strategy == "ulysses":
                from deepfake_video_detection_tpu.ops.ulysses_attention import (
                    ulysses_attention as sp_attention)
            else:
                from deepfake_video_detection_tpu.ops.ring_attention import (
                    ring_attention as sp_attention)

            ba = (self.batch_axis if self.batch_axis
                  and self.batch_axis in self.mesh.shape else None)
            out = sp_attention(q, k, v, self.mesh,
                               seq_axis=self.seq_axis, batch_axis=ba)
        elif self.use_flash and on_tpu and N >= (4096 if train else 256):
            from deepfake_video_detection_tpu.ops.attention import flash_attention
            out = flash_attention(q, k, v)
        else:
            scale = 1.0 / math.sqrt(hd)
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                           preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
        return L.linear(p["proj"], out)

    def apply(self, variables: Dict[str, Params], x: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Params]:
        """``x``: (B, T, H, W, C) normalized frames."""
        p, s = variables["params"], variables["state"]
        B, T = x.shape[0], x.shape[1]
        r_bb = r_d = None
        if rng is not None:
            rng, r_bb, r_d = jax.random.split(rng, 3)
        feats_flat, ns_bb = self.backbone.apply(
            {"params": p["backbone"], "state": s["backbone"]},
            x.reshape((B * T,) + x.shape[2:]), train=train, rng=r_bb)
        y = L.linear(p["proj"], feats_flat.reshape(B, T, self.feature_dim))

        # sinusoidal time encoding — length-extrapolates past training T
        D = self.d_model
        pos = jnp.arange(T, dtype=jnp.float32)[:, None]
        dim = jnp.arange(D // 2, dtype=jnp.float32)[None, :]
        angle = pos / jnp.power(10000.0, 2 * dim / D)
        pe = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
        y = y + pe[None].astype(y.dtype)

        if self.use_cls:
            cls = jnp.broadcast_to(p["cls_token"].astype(y.dtype), (B, 1, D))
            y = jnp.concatenate([cls, y], axis=1)

        if self.stage_axis:
            # GPipe over the stacked blocks: microbatch the clip axis, each
            # stage applies its depth/S blocks, activations ride ppermute
            from deepfake_video_detection_tpu.parallel.pipeline import (
                pipeline_blocks)

            M = self.pp_microbatches
            Bc, N = y.shape[0], y.shape[1]
            if Bc % M != 0:
                raise ValueError(f"batch {Bc} % microbatches {M} != 0")

            def blk(bp, xm):
                xm = xm + self._attention(
                    bp["attn"], L.layer_norm(bp["norm1"], xm), train=train)
                hm = L.layer_norm(bp["norm2"], xm)
                hm = jax.nn.gelu(L.linear(bp["mlp"]["fc1"], hm),
                                 approximate=False)
                return xm + L.linear(bp["mlp"]["fc2"], hm)

            ba = (self.batch_axis if self.batch_axis
                  and self.batch_axis in self.mesh.shape else None)
            y = pipeline_blocks(
                blk, p["blocks"], y.reshape(M, Bc // M, N, D), self.mesh,
                stage_axis=self.stage_axis, batch_axis=ba,
            ).reshape(Bc, N, D)
        else:
            moe_aux = jnp.float32(0.0)
            for i in range(self.depth):
                bp = p["blocks"][str(i)]
                y = y + self._attention(bp["attn"],
                                        L.layer_norm(bp["norm1"], y),
                                        train=train)
                h = L.layer_norm(bp["norm2"], y)
                if self.moe is not None:
                    flat = h.reshape(-1, D)
                    if self.mesh is not None and self.expert_axis:
                        out, aux = self.moe.apply_expert_parallel(
                            bp["mlp"], flat, self.mesh, self.expert_axis,
                            with_aux=True)
                    else:
                        out, aux = self.moe.apply_dense(bp["mlp"], flat,
                                                        with_aux=True)
                    moe_aux = moe_aux + aux
                    y = y + out.reshape(h.shape)
                else:
                    h = jax.nn.gelu(L.linear(bp["mlp"]["fc1"], h),
                                    approximate=False)
                    y = y + L.linear(bp["mlp"]["fc2"], h)

        y = L.layer_norm(p["norm"], y)
        if self.use_cls:
            pooled = y[:, 0]
            tokens = y[:, 1:]
        else:
            # sequence-parallel mode: mean pool (a global mean over the
            # sharded frame axis — XLA inserts the psum)
            pooled = jnp.mean(y, axis=1)
            tokens = y
        pooled = L.dropout(r_d, pooled, self.dropout_rate, train)
        logits = L.linear(p["head"], pooled).astype(jnp.float32)
        # frame scores: attention-free saliency = norm of each frame token
        frame_scores = jnp.linalg.norm(tokens.astype(jnp.float32), axis=-1)
        frame_scores = jax.nn.softmax(frame_scores, axis=-1)
        new_state: Params = {"backbone": ns_bb}
        if self.moe is not None and train:
            # switch-router balance term, averaged over blocks; the train
            # step pops "aux_losses" and folds it into the loss so router
            # collapse (all tokens → one expert) is penalized
            new_state["aux_losses"] = {
                "moe_load_balance": moe_aux / self.depth}
        return (logits, frame_scores), new_state
