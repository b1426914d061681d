"""SpecAugment: jittable time/frequency masking on log-mel features.

Beyond-reference training feature (the reference repo has no feature
augmentation anywhere — util/data_loader.py:7-18 computes plain
Spectrogram→MelScale). Implements the masking half of Park et al. 2019
(SpecAugment, arXiv:1904.08779): frequency masks of uniform width and
ADAPTIVE time masks whose maximum width is a fraction of each item's
valid length (the "adaptive" variant used for LibriSpeech-scale
training; time-warping is omitted, as in most production recipes —
masking carries nearly all of the gain).

TPU notes: everything is static-shape branchless arithmetic — mask
widths/starts are drawn as uniform floats and materialised by comparing
`iota` grids against per-(item, mask) bounds, so the op fuses into the
surrounding step with no gather/scatter and costs ~nothing next to one
conformer block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply(rng: jax.Array, feats: jax.Array, feat_lengths: jax.Array, *,
          n_freq_masks: int = 2, freq_mask_width: int = 27,
          n_time_masks: int = 2, time_mask_frac: float = 0.05
          ) -> jax.Array:
    """Masks (B, T, F) features in-graph. Returns same shape/dtype.

    - n_freq_masks masks of width ~ U[0, freq_mask_width] over mel bins
    - n_time_masks masks of width ~ U[0, time_mask_frac * valid_len]
      placed INSIDE each item's valid frames (padding is already zero)
    Masked cells are set to 0 (the padding value of this pipeline, and
    ~the mean of the normalised features).
    """
    B, T, F = feats.shape
    r_fw, r_fs, r_tw, r_ts = jax.random.split(rng, 4)
    out = feats

    if n_freq_masks > 0 and freq_mask_width > 0:
        u_w = jax.random.uniform(r_fw, (B, n_freq_masks))
        u_s = jax.random.uniform(r_fs, (B, n_freq_masks))
        w = jnp.floor(u_w * (freq_mask_width + 1))         # [0, W]
        s = jnp.floor(u_s * jnp.maximum(F - w, 1.0))       # [0, F-w)
        f = jnp.arange(F, dtype=jnp.float32)               # (F,)
        # (B, K, F): True inside any mask
        hit = ((f[None, None, :] >= s[..., None])
               & (f[None, None, :] < (s + w)[..., None]))
        keep = ~jnp.any(hit, axis=1)                       # (B, F)
        out = out * keep[:, None, :].astype(out.dtype)

    if n_time_masks > 0 and time_mask_frac > 0.0:
        valid = feat_lengths.astype(jnp.float32)           # (B,)
        max_w = time_mask_frac * valid                     # (B,)
        u_w = jax.random.uniform(r_tw, (B, n_time_masks))
        u_s = jax.random.uniform(r_ts, (B, n_time_masks))
        w = jnp.floor(u_w * (max_w[:, None] + 1.0))
        s = jnp.floor(u_s * jnp.maximum(valid[:, None] - w, 1.0))
        t = jnp.arange(T, dtype=jnp.float32)
        hit = ((t[None, None, :] >= s[..., None])
               & (t[None, None, :] < (s + w)[..., None]))
        keep = ~jnp.any(hit, axis=1)                       # (B, T)
        out = out * keep[:, :, None].astype(out.dtype)

    return out
