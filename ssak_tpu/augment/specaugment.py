"""SpecAugment — on-device, jit-safe time/frequency masking.

Replaces the reference's SpeechBrain TimeDomainSpecAugment /
wav2vec2 mask_time_prob (fr yaml + HF config) with a pure-JAX transform
applied inside the train step: random time and frequency masks drawn from a
PRNG key (no Python-side randomness, so the step stays one compiled
program).
"""

import jax
import jax.numpy as jnp


def spec_augment(
    key,
    features,
    n_time_masks: int = 2,
    time_mask_width: int = 40,
    n_freq_masks: int = 2,
    freq_mask_width: int = 20,
    mask_value: float = 0.0,
):
    """features: (B, T, F). Masks drawn independently per batch element."""
    B, T, F = features.shape
    kt, kf = jax.random.split(key)

    def mask_axis(key, length, n_masks, width, axis_len):
        ks, kw = jax.random.split(key)
        starts = jax.random.randint(ks, (B, n_masks), 0, jnp.maximum(1, axis_len - width))
        widths = jax.random.randint(kw, (B, n_masks), 0, width + 1)
        pos = jnp.arange(axis_len)[None, None, :]  # (1, 1, L)
        masked = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
        return masked.any(axis=1)  # (B, L)

    tmask = mask_axis(kt, T, n_time_masks, time_mask_width, T)  # (B, T)
    fmask = mask_axis(kf, F, n_freq_masks, freq_mask_width, F)  # (B, F)
    out = jnp.where(tmask[:, :, None], mask_value, features)
    out = jnp.where(fmask[:, None, :], mask_value, out)
    return out


def mask_time_indices(key, shape, mask_prob: float = 0.05, mask_length: int = 10):
    """wav2vec2-style span masking over frames: returns bool (B, T) with
    ~mask_prob*T/mask_length span starts (HF mask_time_prob semantics)."""
    B, T = shape
    n_starts = max(1, int(mask_prob * T / mask_length))
    starts = jax.random.randint(key, (B, n_starts), 0, max(1, T - mask_length))
    pos = jnp.arange(T)[None, None, :]
    spans = (pos >= starts[..., None]) & (pos < starts[..., None] + mask_length)
    return spans.any(axis=1)
