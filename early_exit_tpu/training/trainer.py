"""Training step + epoch loop (pjit/GSPMD-ready).

The reference's inner loop (train.py:15-92) does, per sub-batch: forward all
exits → summed per-exit CTC loss (AED: 0.7·CE + 0.3·CTC per exit,
train.py:44-51) → backward → global-norm clip → Noam-AdamW step. Here that
whole pipeline is one jitted, shardable function of a TrainState pytree.

Quirk parity: the reference feeds the PADDED frame count as the CTC input
length for every item (train.py:57-58). `ctc_compat_padded_lengths=True`
reproduces that; the default (False, configs.py) uses true per-item
subsampled lengths — the quirk collapses deep exits on padded batches.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.ops import ctc, specaugment


TrainState = Dict[str, Any]   # {"params", "model_state", "opt_state", "step"}


def create_train_state(rng: jax.Array, model, model_cfg: ModelConfig,
                       optimizer) -> TrainState:
    params, model_state = model.init(rng, model_cfg)
    opt_state = optimizer.init(params)
    return {"params": params, "model_state": model_state,
            "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}


def ctc_multi_exit_loss(log_probs: jax.Array, sub_len: jax.Array,
                        labels: jax.Array, label_lengths: jax.Array, *,
                        blank: int, padded_lengths: bool,
                        item_mask: jax.Array | None = None):
    """Sum of per-exit torch-mean CTC losses (train.py:60-62).

    item_mask: optional (B,) 0/1 — rows added to reach a static bucket
    batch size contribute nothing and the mean is over real rows only.
    """
    E, B, Tp, V = log_probs.shape
    if padded_lengths:
        input_len = jnp.full((B,), Tp, jnp.int32)
    else:
        input_len = sub_len

    def per_exit(lp):
        nll = ctc.ctc_loss(lp, input_len, labels, label_lengths,
                           blank=blank, reduction="none")
        denom = jnp.maximum(label_lengths, 1).astype(jnp.float32)
        per_item = nll / denom
        if item_mask is None:
            return jnp.mean(per_item)
        return (jnp.sum(per_item * item_mask)
                / jnp.maximum(jnp.sum(item_mask), 1.0))
    losses = jax.vmap(per_exit)(log_probs)     # (E,)
    return jnp.sum(losses), losses


def distill_loss(log_probs: jax.Array, sub_len: jax.Array, *,
                 temperature: float = 2.0,
                 item_mask: jax.Array | None = None) -> jax.Array:
    """Self-distillation for early exits: mean (over exits, valid frames)
    KL(teacher || student) where the teacher is the deepest exit's
    frame posterior (stop-gradient), temperature-smoothed.

    Implements the capability behind the reference's reserved --distill
    flag (util/conf.py:48-57) — the deepest classifier teaches earlier
    exits, the standard recipe for early-exit ASR models.
    """
    E, B, Tp, V = log_probs.shape
    teacher = jax.lax.stop_gradient(log_probs[-1]) / temperature
    teacher = jax.nn.log_softmax(teacher, axis=-1)        # (B, T', V)
    frame_mask = (jnp.arange(Tp)[None, :] < sub_len[:, None]
                  ).astype(jnp.float32)                    # (B, T')
    if item_mask is not None:
        frame_mask = frame_mask * item_mask[:, None]

    def kl_one(student_logp):
        s = jax.nn.log_softmax(student_logp / temperature, axis=-1)
        kl = jnp.sum(jnp.exp(teacher) * (teacher - s), axis=-1)  # (B, T')
        return (jnp.sum(kl * frame_mask)
                / jnp.maximum(jnp.sum(frame_mask), 1.0))

    kls = jax.vmap(kl_one)(log_probs[:-1])                # (E-1,)
    return (temperature ** 2) * jnp.mean(kls)


# dynamic-chunk training: chunk sizes in subsampled frames (40 ms each)
# — ~0.5/1/2/4 s
CHUNK_SIZES = (12, 25, 50, 100)


def make_chunk_mask(t_sub: int, c: int, chunk_left: int) -> jnp.ndarray:
    """(T', T') bool: q attends within its chunk (incl. in-chunk
    lookahead) and up to chunk_left previous chunks — the pattern
    streaming inference reproduces (serving/streaming.py
    causal_attention)."""
    qc = jnp.arange(t_sub)[:, None] // c
    kc = jnp.arange(t_sub)[None, :] // c
    return (kc <= qc) & (qc - kc <= chunk_left)


def make_train_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig,
                    optimizer) -> Callable:
    """Returns jittable `step(state, batch, rng) -> (state, metrics)`.

    batch: {"feats": (B, T, F), "feat_lengths": (B,),
            "labels": (B, L), "label_lengths": (B,)}.
    Labels include BOS/EOS, as in the reference's CTC targets (train.py:61
    passes the full padded target incl. specials).

    decoder_mode="aed" (full_conformer): per-exit joint loss
    aed_ce_weight·CE(dec, shifted targets) + aed_ctc_weight·CTC(enc)
    (train.py:36-51); decoder input = labels[:, :-1], CE target =
    labels[:, 1:] (train.py:30-32). The CE includes PAD positions —
    reference parity (CrossEntropyLoss() with default ignore_index).
    """
    aed = train_cfg.decoder_mode == "aed"
    dynamic_chunk = (train_cfg.dynamic_chunk and not aed
                     and model_cfg.model_type == "early_conformer")

    def _sample_attn_mask(t_sub: int, rng):
        """50% full attention, else a uniformly-drawn chunk size — the
        standard dynamic-chunk recipe: one model, both serving modes."""
        masks = jnp.stack(
            [make_chunk_mask(t_sub, c, train_cfg.chunk_left)
             for c in CHUNK_SIZES]
            + [jnp.ones((t_sub, t_sub), bool)])
        r_full, r_size = jax.random.split(rng)
        idx = jnp.where(jax.random.bernoulli(r_full, 0.5),
                        len(CHUNK_SIZES),
                        jax.random.randint(r_size, (), 0,
                                           len(CHUNK_SIZES)))
        return masks[idx]

    def _fast_key(rng):
        """Re-wrap the step key as an 'rbg' PRNG key: threefry mask
        generation for the ~60 dropout tensors costs ~40% of the whole
        train step on TPU v5e (measured: 42ms -> 25ms); rbg is
        hardware-friendly and plenty for dropout."""
        if not train_cfg.fast_rng:
            return rng
        data = jax.random.key_data(rng)
        return jax.random.wrap_key_data(
            jnp.concatenate([data, data]).astype(jnp.uint32), impl="rbg")

    def loss_fn(params, model_state, batch, rng):
        item_mask = batch.get("item_mask")
        feats = batch["feats"]
        if train_cfg.specaugment:
            rng, r_sa = jax.random.split(rng)
            feats = specaugment.apply(
                r_sa, feats, batch["feat_lengths"],
                n_freq_masks=train_cfg.sa_freq_masks,
                freq_mask_width=train_cfg.sa_freq_width,
                n_time_masks=train_cfg.sa_time_masks,
                time_mask_frac=train_cfg.sa_time_frac)
        if aed:
            trg = batch["labels"][:, :-1]
            trg_expect = batch["labels"][:, 1:]
            dec_logits, enc_logp, sub_len, new_state = model.apply(
                params, model_state, feats, batch["feat_lengths"],
                trg, model_cfg, rng=rng, train=True)
            loss_ctc, per_exit = ctc_multi_exit_loss(
                enc_logp, sub_len, batch["labels"], batch["label_lengths"],
                blank=model_cfg.blank_id,
                padded_lengths=train_cfg.ctc_compat_padded_lengths,
                item_mask=item_mask)

            def ce_one(d):
                logp = jax.nn.log_softmax(d.astype(jnp.float32), axis=-1)
                nll = -jnp.take_along_axis(
                    logp, trg_expect[..., None], axis=-1)[..., 0]
                per_item = jnp.mean(nll, axis=-1)          # (B,)
                if item_mask is None:
                    return jnp.mean(per_item)
                return (jnp.sum(per_item * item_mask)
                        / jnp.maximum(jnp.sum(item_mask), 1.0))
            ce_per_exit = jax.vmap(ce_one)(dec_logits)
            loss_ce = jnp.sum(ce_per_exit)
            total = (train_cfg.aed_ce_weight * loss_ce
                     + train_cfg.aed_ctc_weight * loss_ctc)
            return total, (per_exit, new_state)
        extra = {}
        if dynamic_chunk:
            t = feats.shape[1]
            t_sub = ((t - 3) // 2 + 1 - 3) // 2 + 1   # two VALID k=3 s=2
            rng, r_mask = jax.random.split(rng)
            extra["attn_mask"] = _sample_attn_mask(t_sub, r_mask)
        log_probs, sub_len, new_state = model.apply(
            params, model_state, feats, batch["feat_lengths"],
            model_cfg, rng=rng, train=True, **extra)
        total, per_exit = ctc_multi_exit_loss(
            log_probs, sub_len, batch["labels"], batch["label_lengths"],
            blank=model_cfg.blank_id,
            padded_lengths=train_cfg.ctc_compat_padded_lengths,
            item_mask=item_mask)
        if train_cfg.distill and log_probs.shape[0] > 1:
            total = total + train_cfg.distill_weight * distill_loss(
                log_probs, sub_len,
                temperature=train_cfg.distill_temperature,
                item_mask=item_mask)
        return total, (per_exit, new_state)


    def step(state: TrainState, batch, rng) -> tuple[TrainState, Dict]:
        rng = jax.random.fold_in(_fast_key(rng), state["step"])
        (loss, (per_exit, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], state["model_state"],
                                   batch, rng)
        updates, new_opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        metrics = {
            "loss": loss,
            "loss_per_exit": per_exit,
            "grad_norm": optax.global_norm(grads),
            "step": state["step"] + 1,
        }
        new_state = {"params": new_params, "model_state": new_model_state,
                     "opt_state": new_opt_state, "step": state["step"] + 1}
        return new_state, metrics

    return step


def make_eval_forward(model, model_cfg: ModelConfig, *,
                      log_probs: bool = True) -> Callable:
    """Jittable inference forward: (params, state, feats, lengths) ->
    (log_probs (E,B,T',V), sub_len).

    log_probs=False asks the model for raw head logits instead (exact
    for greedy decode, skips the fp32 log_softmax materialization);
    models whose apply lacks the kwarg fall back to log-probs."""
    kwargs = {}
    if not log_probs:
        import inspect
        if "log_probs" in inspect.signature(model.apply).parameters:
            kwargs["log_probs"] = False
    def fwd(params, model_state, feats, lengths):
        out, sub_len, _ = model.apply(params, model_state, feats,
                                      lengths, model_cfg, train=False,
                                      **kwargs)
        return out, sub_len
    return fwd
