"""Confidence calibration + uncertainty estimation.

Capability parity with ``src/ensemble_trainer.py``:
* ``ConfidenceCalibrator`` (``:23-59``) — temperature scaling. The reference
  fits T with LBFGS; here the 1-D NLL is minimised in closed loop with
  Newton's method on log-temperature (jitted value+grad+hessian) — faster and
  deterministic on TPU.
* ``UncertaintyEstimator`` (``:62-100``) — ensemble disagreement (std of
  member fake-probs) and decision-margin uncertainty.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


class ConfidenceCalibrator:
    """Temperature scaling: minimise NLL of ``softmax(logits / T)``."""

    def __init__(self, init_temperature: float = 1.0):
        self.temperature = float(init_temperature)

        def nll(log_t, logits, labels):
            t = jnp.exp(log_t)
            logp = jax.nn.log_softmax(logits / t, axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=-1))

        self._vg = jax.jit(jax.value_and_grad(nll))
        self._hess = jax.jit(jax.grad(jax.grad(nll)))

    def fit(self, logits: np.ndarray, labels: np.ndarray,
            steps: int = 50, tol: float = 1e-6) -> float:
        logits = jnp.asarray(logits, jnp.float32)
        labels = jnp.asarray(labels, jnp.int32)
        log_t = jnp.asarray(float(np.log(self.temperature)))
        for _ in range(steps):
            val, g = self._vg(log_t, logits, labels)
            h = self._hess(log_t, logits, labels)
            # damped Newton with a gradient fallback when curvature is tiny
            step = jnp.where(jnp.abs(h) > 1e-6, g / h, g)
            step = jnp.clip(step, -1.0, 1.0)
            new_log_t = log_t - step
            if float(jnp.abs(new_log_t - log_t)) < tol:
                log_t = new_log_t
                break
            log_t = new_log_t
        self.temperature = float(jnp.exp(log_t))
        return self.temperature

    def calibrate(self, logits: np.ndarray) -> np.ndarray:
        z = np.asarray(logits, np.float64) / self.temperature
        z = z - z.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)


class UncertaintyEstimator:
    """Disagreement/margin uncertainty over ensemble member outputs."""

    def __init__(self, fake_index: int = 1):
        self.fake_index = fake_index

    def member_fake_probs(self, member_logits: np.ndarray) -> np.ndarray:
        """(M, B, C) logits → (M, B) fake probabilities."""
        z = np.asarray(member_logits, np.float64)
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        probs = e / e.sum(-1, keepdims=True)
        return probs[..., self.fake_index]

    def disagreement(self, member_logits: np.ndarray) -> np.ndarray:
        """Std of member fake-probs per sample: (M, B, C) → (B,)."""
        return self.member_fake_probs(member_logits).std(axis=0)

    def margin(self, ensemble_probs: np.ndarray,
               threshold: float = 0.5) -> np.ndarray:
        """1 − 2·|p − thr|: high near the decision boundary. (B, C) → (B,)."""
        pf = np.asarray(ensemble_probs)[..., self.fake_index]
        return 1.0 - 2.0 * np.abs(pf - threshold)

    def combined(self, member_logits: np.ndarray,
                 ensemble_probs: np.ndarray,
                 threshold: float = 0.5) -> Dict[str, np.ndarray]:
        d = self.disagreement(member_logits)
        m = self.margin(ensemble_probs, threshold)
        return {"disagreement": d, "margin": m,
                "uncertainty": np.clip(0.5 * d * 2.0 + 0.5 * m, 0.0, 1.0)}
