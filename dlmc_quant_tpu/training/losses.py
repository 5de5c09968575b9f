"""Loss functions (pure jnp).  ref: trainer/loss/loss.py:4-52"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll(logits, labels):
    """NLL over log-probabilities (caller provides log_softmax output)."""
    return -jnp.mean(jnp.take_along_axis(logits, labels[:, None],
                                         axis=1))


def cross_entropy(logits, labels):
    """Softmax cross-entropy from raw logits (ref: loss.py cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


native_cross_entropy = cross_entropy


def smoothlabel_ce_loss(logits, labels, smoothing: float = 0.1):
    """Label-smoothed CE (ref: loss.py smoothlabel_ce_loss)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, n)
    soft = one_hot * (1.0 - smoothing) + smoothing / n
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def kl_loss(student_logits, teacher_logits, temperature: float = 1.0):
    """KL(teacher ‖ student) on softened logits (ref: loss.py kl_loss)."""
    t = temperature
    p_t = jax.nn.softmax(teacher_logits / t, axis=-1)
    logp_s = jax.nn.log_softmax(student_logits / t, axis=-1)
    logp_t = jax.nn.log_softmax(teacher_logits / t, axis=-1)
    return jnp.mean(jnp.sum(p_t * (logp_t - logp_s), axis=-1)) * t * t


def l2_loss(output, target):
    """Mean over batch of per-row summed squared error.

    The PTQ reconstruction objective AND the observer ranking metric.
    ref: trainer/loss/loss.py l2_loss
    """
    diff = (output - target).reshape(output.shape[0], -1)
    return jnp.mean(jnp.sum(diff * diff, axis=1))


def kurtosis(w, target: float = 1.8):
    """Single-tensor kurtosis regularizer term (ref: loss.py Kurt)."""
    mu = jnp.mean(w)
    sigma2 = jnp.mean((w - mu) ** 2)
    k = jnp.mean((w - mu) ** 4) / (sigma2 ** 2 + 1e-12)
    return (k - target) ** 2


def kutosis_loss(weights, target: float = 1.8):
    """Mean kurtosis regularization over conv weights; name kept for YAML
    parity (ref: loss.py kutosis_loss [sic], classification_trainer.py:49).
    """
    terms = [kurtosis(w, target) for w in weights]
    return jnp.mean(jnp.stack(terms)) if terms else jnp.zeros(())


LOSSES = {
    "nll": nll,
    "cross_entropy": cross_entropy,
    "native_cross_entropy": native_cross_entropy,
    "smoothlabel_ce_loss": smoothlabel_ce_loss,
    "kl_loss": kl_loss,
    "l2_loss": l2_loss,
    "kutosis_loss": kutosis_loss,
}


def get_loss(name: str):
    try:
        return LOSSES[name]
    except KeyError:
        raise ValueError(f"unknown loss {name!r}; known: "
                         f"{sorted(LOSSES)}") from None
