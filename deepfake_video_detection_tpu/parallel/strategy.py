"""User-facing parallelism strategy: CLI flags → mesh + shardings + model kwargs.

This productizes the §2.6 machinery (TP head sharding, ring/Ulysses
sequence parallelism, GPipe pipeline stages, MoE expert parallelism) that
round 2 exercised only from ``__graft_entry__.dryrun_multichip`` and the
test suite. The SAME sharding rules are used by the dryrun, the CLIs and
the tests — one source of truth.

Usage from a training CLI::

    add_parallel_args(parser)
    ...
    plan, model_kwargs = build_plan(args, model_name, num_frames,
                                    depth=depth)
    model = TemporalTransformerDetector(..., **model_kwargs)
    trainer = Trainer(model, train_ds, val_ds, cfg, plan=plan)

The reference has no analogue (single device, SURVEY.md §2.6); the design
follows the mesh-and-annotate recipe: build one ``jax.sharding.Mesh`` whose
axes name the parallelism dimensions, place params/batches with
``NamedSharding``, and let XLA insert the collectives (psum over ``data``,
ppermute rings over ``seq``/``stage``, all-to-alls over ``expert``) on ICI.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ---------------------------------------------------------------------------
# sharding rules (shared with __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

def tp_param_pspec(path: str, shape=None) -> P:
    """Tensor-parallel rules for the flagship ``BackboneDetector``: shard
    the wide head matmul and the final backbone conv over ``model``.
    fc1.weight is (256, 1280) — shard the 1280 feature (contracting) dim;
    conv_head.weight is (1, 1, 320, 1280) HWIO — shard output channels.
    Everything else replicates (the B0 trunk is small; TP pays off only on
    the wide leaves)."""
    if path.endswith("fc1.weight"):
        return P(None, "model")
    if path.endswith("conv_head.weight"):
        return P(None, None, None, "model")
    return P()


def pp_param_pspec(path: str, shape=None, stage_axis: str = "stage") -> P:
    """GPipe rules for the stacked-block temporal transformer: every
    ``blocks.*`` leaf carries a leading depth axis — shard it over the
    stage axis so each device holds depth/S blocks."""
    return P(stage_axis) if path.startswith("blocks.") else P()


def make_fsdp_spec_fn(data_size: int, axis: str = "data",
                      min_size: int = 2 ** 14,
                      base: Optional[Callable[..., P]] = None
                      ) -> Callable[[str, Any], P]:
    """FSDP / ZeRO-3 rule: shard every large-enough param leaf over the
    ``data`` axis so each of the N data-parallel devices stores 1/N of the
    parameters AND (because ``optax``'s ``init`` builds moments with
    ``zeros_like`` on the already-placed leaves) 1/N of the optimizer state.
    XLA/GSPMD then inserts the canonical ZeRO-3 collectives automatically:
    all-gather of each weight right before its matmul in forward/backward,
    reduce-scatter of its gradient — nothing is hand-written (the
    scaling-book "fully sharded" recipe; the reference has no distributed
    training at all, SURVEY.md §2.6).

    Per leaf we shard the LARGEST dimension divisible by ``data_size``
    (ties → the last such dim, which for HWIO convs is the output-channel
    dim XLA tiles best); leaves smaller than ``min_size`` elements, or with
    no divisible dim, replicate — gathering a tiny BN vector costs more
    latency than storing it N times.

    ``base`` composes with another rule (e.g. ``tp_param_pspec``): dims the
    base rule already assigns to a mesh axis are kept, and FSDP shards the
    largest *remaining* free dim over ``data`` — 2-D (data x model) weight
    sharding on the wide head leaves.
    """

    def spec(path: str, shape=None) -> P:
        base_spec = tuple(base(path, shape)) if base is not None else ()
        if shape is None:
            return P(*base_spec)
        shape = tuple(shape)
        n_elems = 1
        for d in shape:
            n_elems *= int(d)
        if n_elems < min_size:
            return P(*base_spec)
        entries = list(base_spec) + [None] * (len(shape) - len(base_spec))
        pick, pick_sz = -1, 0
        for i, d in enumerate(shape):
            if entries[i] is None and d % data_size == 0 and d >= pick_sz:
                pick, pick_sz = i, d
        if pick < 0:
            return P(*base_spec)
        entries[pick] = axis
        while entries and entries[-1] is None:
            entries.pop()
        return P(*entries)

    return spec


def sharding_summary(params) -> Tuple[int, int, float]:
    """``(sharded_leaves, total_leaves, fraction_of_param_bytes_sharded)``
    over a placed params tree — lets callers SURFACE silent replication
    fallbacks (e.g. ``--fsdp`` on a device count nothing divides by)."""
    leaves = jax.tree_util.tree_leaves(params)
    n_sh, total_b, sh_b = 0, 0, 0
    for leaf in leaves:
        b = int(leaf.size) * leaf.dtype.itemsize
        total_b += b
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and any(a is not None for a in spec):
            n_sh += 1
            sh_b += b
    return n_sh, len(leaves), (sh_b / total_b if total_b else 0.0)


def place_variables(variables: Dict[str, Any], mesh: Mesh,
                    spec_fn: Callable[..., P]) -> Dict[str, Any]:
    """Device-put a ``{"params", "state"}`` tree with per-leaf shardings
    from ``spec_fn(path, shape)`` (params) / replication (state)."""
    from deepfake_video_detection_tpu.utils.tree import (
        flatten_dotted, unflatten_dotted)

    repl = NamedSharding(mesh, P())
    flat = flatten_dotted(variables["params"])
    params = unflatten_dotted({
        k: jax.device_put(np.asarray(v),
                          NamedSharding(mesh, spec_fn(k, np.shape(v))))
        for k, v in flat.items()})
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), repl), variables["state"])
    return {"params": params, "state": state}


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------

@dataclass
class ParallelPlan:
    """Everything the Trainer needs to run one parallelism configuration."""

    mesh: Mesh
    # dotted param path (+ shape) -> PartitionSpec (P() = replicated)
    param_spec_fn: Callable[..., P] = lambda path, shape=None: P()
    # batch leaf name -> PartitionSpec; leaves not listed shard P("data")
    batch_specs: Dict[str, P] = field(default_factory=dict)
    pure_dp: bool = True
    description: str = "dp"
    # loader pads every batch to this multiple: data-axis size normally;
    # data * pp_microbatches under GPipe (each microbatch must still split
    # over the data axis)
    batch_multiple: int = 1
    # scan-of-steps (--steps_per_call) composes with plain-batch-layout
    # plans (dp / tp / fsdp: every batch leaf shards P(None, "data") with a
    # leading k axis); model-internal shard_map modes (sp / pp / ep) stay
    # single-step
    scan_of_steps_ok: bool = True

    def batch_spec(self, key: str) -> P:
        return self.batch_specs.get(key, P("data"))


def parse_mesh_arg(mesh_arg: str) -> Dict[str, int]:
    """``"data=2,model=2"`` → ``{"data": 2, "model": 2}`` (ordered)."""
    out: Dict[str, int] = {}
    for part in (mesh_arg or "").split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad --mesh entry {part!r} (want axis=N)")
        k, v = part.split("=", 1)
        out[k.strip()] = int(v)
    return out


def add_parallel_args(ap: argparse.ArgumentParser,
                      temporal: bool = True) -> None:
    g = ap.add_argument_group(
        "parallelism", "multi-chip sharding over a jax.sharding.Mesh "
        "(axes: data / model / seq / stage / expert)")
    g.add_argument("--mesh", default=None,
                   help="mesh axes, e.g. 'data=4,model=2' (TP for the "
                        "detector head) — 'data=-1' means all remaining "
                        "devices; default: all devices on data")
    g.add_argument("--fsdp", action="store_true",
                   help="FSDP/ZeRO-3: shard params + optimizer state over "
                        "the data axis (each device stores 1/N; XLA "
                        "all-gathers weights per layer and reduce-scatters "
                        "grads); composes with --mesh model=N")
    if temporal:
        g.add_argument("--seq", default="none",
                       choices=["none", "ring", "ulysses"],
                       help="sequence parallelism over the FRAME axis "
                            "(temporal model): ppermute KV ring or "
                            "all-to-all head sharding")
        g.add_argument("--seq_par", type=int, default=1,
                       help="seq-parallel degree (mesh 'seq' axis size)")
        g.add_argument("--pp_stages", type=int, default=1,
                       help="GPipe pipeline stages (mesh 'stage' axis; "
                            "temporal depth must divide)")
        g.add_argument("--pp_microbatches", type=int, default=2)
        g.add_argument("--moe_experts", type=int, default=0,
                       help="experts per block MLP (temporal); shards over "
                            "the mesh 'expert' axis")
        g.add_argument("--expert_par", type=int, default=0,
                       help="expert-parallel degree (default: min("
                            "moe_experts, devices))")


def build_plan(args: argparse.Namespace, model_name: str, num_frames: int,
               depth: Optional[int] = None,
               n_devices: Optional[int] = None
               ) -> Tuple[Optional[ParallelPlan], Dict[str, Any]]:
    """Resolve CLI flags into a (plan, temporal-model-kwargs) pair.

    Returns ``(None, {})`` when nothing beyond the default single-device /
    pure-DP path is requested (the caller keeps its ``make_mesh()``
    behavior). Raises ``ValueError`` on inconsistent requests.
    """
    n = n_devices if n_devices is not None else len(jax.devices())
    axes = parse_mesh_arg(getattr(args, "mesh", None) or "")
    seq = getattr(args, "seq", "none")
    seq_par = int(getattr(args, "seq_par", 1) or 1)
    pp_stages = int(getattr(args, "pp_stages", 1) or 1)
    moe_experts = int(getattr(args, "moe_experts", 0) or 0)
    expert_par = int(getattr(args, "expert_par", 0) or 0)

    is_temporal = model_name.lower() in ("temporal", "temporal_transformer")
    wants_sp = seq != "none" or seq_par > 1
    wants_pp = pp_stages > 1
    wants_ep = moe_experts > 0 and (expert_par > 1 or expert_par == 0
                                    and moe_experts > 1 and n > 1)
    tp = int(axes.get("model", 1))
    fsdp = bool(getattr(args, "fsdp", False))

    if not axes and not wants_sp and not wants_pp and not moe_experts \
            and not fsdp:
        return None, {}

    # ---- validation ----
    if tp > 1 and model_name.lower() not in ("pretrained", "backbone"):
        raise ValueError(
            "--mesh model=N (tensor parallelism) is wired for the "
            "pretrained BackboneDetector head; use --seq/--pp_stages/"
            "--moe_experts for the temporal family")
    for flag, ok in (("--seq/--seq_par", wants_sp), ("--pp_stages", wants_pp),
                     ("--moe_experts", moe_experts > 0)):
        if ok and not is_temporal:
            raise ValueError(f"{flag} requires --model temporal")
    if sum(map(bool, (tp > 1, wants_sp, wants_pp, wants_ep))) > 1:
        raise ValueError("combine at most one of model=N / seq / pp_stages / "
                         "expert parallelism per training run (3-axis "
                         "composition is exercised by dryrun_multichip "
                         "phase 5); pass --expert_par 1 to run MoE densely "
                         "alongside seq/pp")
    if fsdp and (wants_sp or wants_pp or wants_ep):
        raise ValueError("--fsdp shards params over the data axis and "
                         "currently composes with pure DP or --mesh model=N "
                         "only; drop --seq/--pp_stages/--moe_experts")
    if wants_sp:
        if seq == "none":
            seq = "ring"
        if seq_par <= 1:
            seq_par = min(n, 2)
        if num_frames % seq_par:
            raise ValueError(f"--num_frames {num_frames} must be divisible "
                             f"by --seq_par {seq_par}")
    if wants_pp:
        if depth is not None and depth % pp_stages:
            raise ValueError(f"temporal depth {depth} must be divisible by "
                             f"--pp_stages {pp_stages}")
    if wants_ep and expert_par == 0:
        expert_par = min(moe_experts, max(1, n // max(1, axes.get("data", 1))
                                          if "data" in axes else n))
        while expert_par > 1 and (n % expert_par or moe_experts % expert_par):
            expert_par -= 1
    if wants_ep and moe_experts % max(1, expert_par):
        raise ValueError(f"--moe_experts {moe_experts} must be divisible by "
                         f"--expert_par {expert_par}")

    # ---- mesh axes (data first, model axis second/innermost = ICI-adjacent)
    mesh_axes: Dict[str, int] = {}
    second: Optional[Tuple[str, int]] = None
    if tp > 1:
        second = ("model", tp)
    elif wants_sp:
        second = ("seq", seq_par)
    elif wants_pp:
        second = ("stage", pp_stages)
    elif wants_ep and expert_par > 1:
        second = ("expert", expert_par)
    inner = second[1] if second else 1
    if n % inner:
        raise ValueError(f"{n} devices not divisible by the "
                         f"{second[0] if second else 'model'}-parallel "
                         f"degree {inner}")
    data = axes.get("data", -1)
    data = n // inner if data in (-1, 0) else data
    if data * inner > n:
        raise ValueError(f"mesh data={data} x {inner} exceeds {n} devices")
    mesh_axes["data"] = data
    if second:
        mesh_axes[second[0]] = second[1]

    devices = np.asarray(jax.devices()[:data * inner]).reshape(
        data, inner if second else 1)
    if second:
        mesh = Mesh(devices, axis_names=("data", second[0]))
    else:
        mesh = Mesh(devices.reshape(data), axis_names=("data",))

    # ---- plan + model kwargs ----
    model_kwargs: Dict[str, Any] = {}
    param_spec_fn: Callable[..., P] = lambda path, shape=None: P()
    batch_specs: Dict[str, P] = {}
    pure_dp = second is None
    desc = f"dp={data}"
    if tp > 1:
        param_spec_fn = tp_param_pspec
        desc += f",tp={tp}"
    if fsdp:
        if data < 2:
            raise ValueError("--fsdp needs a data axis of at least 2 "
                             f"(got data={data})")
        param_spec_fn = make_fsdp_spec_fn(
            data, base=tp_param_pspec if tp > 1 else None)
        pure_dp = False
        desc += ",fsdp"
    if wants_sp:
        model_kwargs.update(mesh=mesh, seq_axis="seq", seq_strategy=seq,
                            use_cls=False)
        batch_specs["frames"] = P("data", "seq")
        desc += f",sp={seq_par}({seq})"
    if wants_pp:
        model_kwargs.update(mesh=mesh, stage_axis="stage",
                            pp_microbatches=int(getattr(
                                args, "pp_microbatches", 2)))
        param_spec_fn = pp_param_pspec
        desc += f",pp={pp_stages}"
    if moe_experts > 0:
        model_kwargs["moe_experts"] = moe_experts
        if wants_ep and expert_par > 1:
            model_kwargs.update(mesh=mesh, expert_axis="expert")
            desc += f",ep={expert_par}x{moe_experts}e"
        else:
            desc += f",moe={moe_experts}e(dense)"

    batch_multiple = data
    if wants_pp:
        batch_multiple = data * int(getattr(args, "pp_microbatches", 2))
    plan = ParallelPlan(mesh=mesh, param_spec_fn=param_spec_fn,
                        batch_specs=batch_specs, pure_dp=pure_dp,
                        description=desc, batch_multiple=batch_multiple,
                        scan_of_steps_ok=second is None
                        or second[0] == "model")
    return plan, model_kwargs
