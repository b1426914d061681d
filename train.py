#!/usr/bin/env python
"""Training CLI — same surface as the reference train.py.

    python train.py --decoder_mode ctc --model_type early_conformer ...

Pipeline (reference call stack parity, SURVEY.md §3.1, redesigned for TPU):
build model per flags → load checkpoint / average checkpoints / Xavier
init (train.py:216-230) → data pipeline → Noam-AdamW with warmup
defaulting to one epoch of sub-batches (train.py:245-246) → jitted,
mesh-sharded train step per sub-batch → per-step loss/LR prints, periodic
sample decode (train.py:74-88) → save-on-best epoch checkpoints incl.
optimizer state (train.py:120-128) + metrics stream.
"""

from __future__ import annotations

import os
import sys
import time

import jax

# honour an explicit platform override even when the environment's
# sitecustomize pins a TPU backend (EET_PLATFORM=cpu for host-only runs)
if os.environ.get("EET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from early_exit_tpu.cli import get_args
from early_exit_tpu.data.librispeech import (LibriSpeechDataset,
                                             SyntheticDataset)
from early_exit_tpu.data.pipeline import Pipeline
from early_exit_tpu.models.registry import build_model
from early_exit_tpu.ops import ctc as ctc_ops
from early_exit_tpu.optim import make_optimizer, noam_schedule
from early_exit_tpu.parallel import make_mesh, shard_batch, shard_params
from early_exit_tpu.parallel.mesh import replicate
from early_exit_tpu.training import checkpoint, trainer
from early_exit_tpu.utils import MetricsLogger, count_parameters


from early_exit_tpu.runtime import enable_compilation_cache
enable_compilation_cache()


def build_dataset(args):
    if args.synthetic_data:
        return SyntheticDataset(n_items=max(args.batch_size * 4, 64),
                                seed=args.seed)
    try:
        return LibriSpeechDataset(args.data_root, args.train_split)
    except FileNotFoundError as e:
        sys.exit(f"{e}\n(use --data_root to point at LibriSpeech, or "
                 f"--synthetic_data true for a smoke run)")


def main(argv=None):
    args, model_cfg, train_cfg, audio_cfg, tokenizer = get_args(argv)
    model = build_model(model_cfg)

    rng = jax.random.PRNGKey(args.seed)
    params, model_state = model.init(rng, model_cfg)

    # checkpoint restore (same precedence as train.py:216-230)
    if args.load_model_path is not None:
        params, model_state = checkpoint.load_model_file(
            args.load_model_path, params, model_state)
        print(f"loaded checkpoint: {args.load_model_path}")
    elif None not in (args.load_model_dir, args.avg_model_start,
                      args.avg_model_end):
        params, model_state = checkpoint.avg_models(
            args.load_model_dir, args.avg_model_start, args.avg_model_end,
            params, model_state)
        print(f"averaged checkpoints {args.avg_model_start}.."
              f"{args.avg_model_end} from {args.load_model_dir}")
    # else: fresh Xavier init (the init above)

    print(f"The model has {count_parameters(params):,} trainable parameters")

    dataset = build_dataset(args)
    pipe = Pipeline(dataset, tokenizer, audio_cfg, train_cfg,
                    bpe=args.bpe, shuffle=args.shuffle, seed=args.seed,
                    workers=args.n_workers)

    warmup = args.warmup
    if warmup == -1:
        warmup = pipe.batches_per_epoch() * args.n_batch_split
    print("batch_size:", args.batch_size, " num_heads:", args.n_heads,
          " num_encoder_layers:", args.n_enc_layers_per_exit,
          " optimizer: NOAM[warmup", warmup, "] vocab_size:",
          model_cfg.vocab_size, "SOS,EOS,PAD", model_cfg.bos_id,
          model_cfg.eos_id, model_cfg.pad_id, "devices:", jax.devices())

    optimizer = make_optimizer(args.d_model, warmup, clip=args.clip,
                               adam_eps=args.adam_eps,
                               weight_decay=args.weight_decay)
    schedule = noam_schedule(args.d_model, warmup)
    state = {"params": params, "model_state": model_state,
             "opt_state": optimizer.init(params),
             "step": jnp.zeros((), jnp.int32)}

    # mesh sharding (dp x tp); single device degenerates gracefully
    n_dev = len(jax.devices())
    tp = max(args.tp, 1)
    dp = args.dp if args.dp is not None else max(n_dev // tp, 1)
    if dp * tp > 1:
        mesh = make_mesh(jax.devices()[:dp * tp], dp=dp, tp=tp)
        state = {"params": shard_params(state["params"], mesh),
                 "model_state": replicate(state["model_state"], mesh),
                 "opt_state": replicate(state["opt_state"], mesh),
                 "step": state["step"]}
        place_batch = lambda b: shard_batch(b, mesh)
        print(f"mesh: data={dp} x model={tp}")
    else:
        place_batch = lambda b: b

    # donate the train state: params + Adam moments are the dominant HBM
    # residents, and donation lets XLA update them in place instead of
    # holding old+new copies live across each step (time-neutral on v5e —
    # measured 24.1 vs 24.2 ms/step — but halves transient state memory,
    # which is what bounds model size at scale). The loop below never
    # touches a pre-step state after calling step_fn.
    step_fn = jax.jit(trainer.make_train_step(model, model_cfg, train_cfg,
                                              optimizer),
                      donate_argnums=0)
    logger = MetricsLogger(args.log_dir)
    step_rng = jax.random.PRNGKey(args.seed + 1)

    moddir = args.save_model_dir
    if not os.path.isabs(moddir):
        moddir = os.path.join(os.getcwd(), moddir.lstrip("/"))
    os.makedirs(moddir, exist_ok=True)

    # auto-resume: pick up the newest epoch checkpoint (incl. optimizer
    # state + schedule step) — replaces the reference's vestigial resume
    # that could never fire (train.py:97-111, hardcoded nepoch=-1)
    start_epoch = 0
    latest = checkpoint.latest_epoch(moddir)
    if (latest is not None and args.load_model_path is None
            and args.load_model_dir is None):
        # resume needs BOTH the model and the optimizer checkpoint: a
        # params-only resume restarts the Noam schedule at step 0 and
        # the warmup-LR spike wrecks the model (measured: a crash while
        # writing lr089 left mod089 orphaned; resuming it took the loss
        # 0.56 -> 2.6). Prefer the newest epoch whose pair is complete.
        resume = latest
        while (resume is not None and resume >= 0
               and os.path.exists(checkpoint.model_ckpt_path(moddir,
                                                             resume))
               and not os.path.exists(checkpoint.opt_ckpt_path(moddir,
                                                               resume))):
            resume -= 1
            while resume >= 0 and not os.path.exists(
                    checkpoint.model_ckpt_path(moddir, resume)):
                resume -= 1
        if resume is None or resume < 0:
            print(f"warning: newest checkpoint epoch {latest} has no "
                  f"optimizer state and no earlier complete pair exists "
                  f"— resuming params-only (LR schedule restarts; "
                  f"expect a warmup loss spike)")
            resume = latest
        elif resume != latest:
            print(f"warning: epoch {latest} has no optimizer state "
                  f"(crash during save?) — resuming from the newest "
                  f"complete pair, epoch {resume}")
        p, ms = checkpoint.load_epoch(moddir, resume, state["params"],
                                      state["model_state"])
        opt_path = checkpoint.opt_ckpt_path(moddir, resume)
        if os.path.exists(opt_path):
            tree = checkpoint._to_device(checkpoint.load_pytree(
                {"opt_state": state["opt_state"], "step": state["step"]},
                opt_path))
            state = {"params": p, "model_state": ms,
                     "opt_state": tree["opt_state"],
                     "step": tree["step"]}
        else:
            state = {"params": p, "model_state": ms,
                     "opt_state": state["opt_state"],
                     "step": state["step"]}
        start_epoch = resume + 1
        print(f"auto-resume from epoch {resume} "
              f"(step {int(state['step'])})")

    best_loss = float("inf")
    log_every = 50
    # --profile_trace: capture steps [1, 1+profile_steps) of the first
    # epoch (step 0 is the compile; tracing it drowns the timeline)
    prof = {"dir": args.profile_trace, "left": args.profile_steps,
            "on": False}
    for epoch in range(start_epoch, train_cfg.n_epochs):
        t0 = time.time()
        # Metrics stay on device between host fetches: a scalar fetch is a
        # full host<->device round-trip (~26 ms over the axon relay, on par
        # with the step itself), so fetching the loss every step would
        # halve real throughput. The loss accumulates device-side and
        # loss/grad-norm land on the host only every `log_every` steps.
        loss_sum = jnp.zeros((), jnp.float32)
        n_batches = 0
        host_step = int(state["step"])
        for i, batch in enumerate(pipe.epoch(epoch)):
            if prof["dir"] and not prof["on"] and i == 1:
                jax.profiler.start_trace(prof["dir"])
                prof["on"] = True
            state, metrics = step_fn(state, place_batch(batch), step_rng)
            if prof["on"]:
                prof["left"] -= 1
                if prof["left"] <= 0:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    prof.update(on=False, dir=None)
                    print(f"profiler trace written to {args.profile_trace}")
            loss_sum = loss_sum + metrics["loss"]
            n_batches += 1
            host_step += 1
            if i % log_every == 0:
                loss = float(metrics["loss"])
                gnorm = float(metrics["grad_norm"])
                lr = float(schedule(host_step - 1))
                print(f"step {host_step} loss {loss:.4f} "
                      f"grad_norm {gnorm:.3f} RATE: {lr:.6e}")
                logger.log(host_step, {"loss": loss, "lr": lr,
                                       "grad_norm": gnorm})
            if i % 500 == 0 and train_cfg.decoder_mode == "ctc":
                _sample_decode(model, model_cfg, state, batch, tokenizer,
                               args)
        if n_batches == 0:
            sys.exit("empty epoch — no usable utterances")
        loss_total = float(loss_sum) / n_batches
        dt = time.time() - t0
        print(f"LOSS_TOTAL-{epoch} := {loss_total:.4f}  ({dt:.1f}s, "
              f"{n_batches} sub-batches)")
        logger.log(epoch, {"Total loss": loss_total})

        if loss_total < best_loss:
            best_loss = loss_total
            print("saving:", checkpoint.model_ckpt_path(moddir, epoch))
            checkpoint.save_epoch(moddir, epoch, state["params"],
                                  state["model_state"],
                                  state["opt_state"], state["step"])
            pruned = checkpoint.prune_old(moddir, args.keep_last_ckpts)
            if pruned:
                print(f"pruned {len(pruned)} old checkpoint(s) "
                      f"(--keep_last_ckpts {args.keep_last_ckpts}): "
                      f"epochs {pruned[0]}..{pruned[-1]}")
        else:
            print("WORST: not saving epoch", epoch)


def _sample_decode(model, model_cfg, state, batch, tokenizer, args):
    """Train-time sanity decode of one utterance (train.py:74-81)."""
    try:
        logp, sub_len, _ = model.apply(
            state["params"], state["model_state"], batch["feats"][:1],
            batch["feat_lengths"][:1], model_cfg, train=False)
        toks, n = ctc_ops.greedy_decode(logp[-1], sub_len[:1])
        hyp_ids = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]
        ll = int(batch["label_lengths"][0])
        ref_ids = [int(t) for t in np.asarray(batch["labels"][0])[1:ll]]
        print("EXPECTED:", tokenizer.decode(ref_ids).lower())
        print("CTC_OUT :", tokenizer.decode(hyp_ids).lower())
    except Exception as e:  # decode is best-effort; never kill training
        print("sample decode failed:", e)


if __name__ == "__main__":
    main()
