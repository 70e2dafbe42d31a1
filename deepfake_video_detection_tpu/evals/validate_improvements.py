"""Ensemble-improvement validation demo (≙ ``validate_improvements.py``).

Two parts, matching the reference:
1. a simulated baseline-vs-ensemble metric comparison on synthetic labels
   (``:22-51`` — the reference *simulates* the 50%→75% claim; so do we,
   and we say so in the output);
2. a real forward-pass sanity check of ``BackboneDetector`` vs
   ``EnsembleDetector`` on random tensors (``test_real_models:130-189``),
   checking output shapes and member-count behaviour.
"""

from __future__ import annotations

import numpy as np

from deepfake_video_detection_tpu.evals.metrics import binary_metrics, roc_auc


def simulate_comparison(n: int = 200, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    # baseline: coin-flip scores; ensemble: moderately separable scores
    base_scores = rng.random(n)
    ens_scores = np.clip(labels * 0.5 + rng.normal(0.25, 0.2, n), 0, 1)
    out = {}
    for name, scores in (("baseline", base_scores), ("ensemble", ens_scores)):
        preds = (scores >= 0.5).astype(np.int64)
        m = binary_metrics(labels, preds)
        m["auc"] = roc_auc(labels, scores)
        out[name] = m
    return out


def test_real_models() -> dict:
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector, EnsembleDetector)

    x = jnp.asarray(np.random.default_rng(0).random((1, 2, 64, 64, 3)),
                    jnp.float32)
    single = BackboneDetector("resnet18")
    sv = single.init(jax.random.PRNGKey(0))
    (logits, scores), _ = jax.jit(
        lambda v, x: single.apply(v, x))(sv, x)
    assert logits.shape == (1, 2) and scores.shape == (1, 2)

    ens = EnsembleDetector(("resnet18", "resnet18"))
    ev = ens.init(jax.random.PRNGKey(1))
    (elogits, escores, member), _ = jax.jit(
        lambda v, x: ens.apply(v, x, return_member_logits=True))(ev, x)
    assert elogits.shape == (1, 2) and member.shape == (2, 1, 2)
    return {"single_logits": np.asarray(logits).tolist(),
            "ensemble_logits": np.asarray(elogits).tolist(),
            "members": int(member.shape[0])}


def main(argv=None) -> int:
    print("— simulated comparison (synthetic labels; illustrative only) —")
    sim = simulate_comparison()
    for name, m in sim.items():
        print(f"{name:>9}: acc={m['accuracy']:.2f} prec={m['precision']:.2f} "
              f"rec={m['recall']:.2f} f1={m['f1']:.2f} auc={m['auc']:.2f}")
    print("— real forward-pass sanity check —")
    info = test_real_models()
    print(f"single + {info['members']}-member ensemble forwards OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
