#!/usr/bin/env python
"""Streaming-inference evaluation: chunked decode of an eval split.

Feeds each utterance to serving.StreamingRecognizer in real-time-sized
pieces and reports, against the full-utterance batch decode of the same
checkpoint: streaming WER, full WER, transcript agreement, and chunk
compute latency (the serving-relevant number: added latency on top of
the chunk_s + right_s algorithmic delay).

Usage:
  EET_PLATFORM=cpu python tools/streaming_demo.py \
      --load_model_path model/mod009-transformer --synthetic_data true \
      [--chunk_s 1.0 --left_s 2.0 --right_s 0.32 --n_exit 3] [tiny dims...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get("EET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    from early_exit_tpu.cli import get_args
    from early_exit_tpu.data.librispeech import (LibriSpeechDataset,
                                                 SyntheticDataset)
    from early_exit_tpu.data import text as text_mod
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.ops import ctc, frontend
    from early_exit_tpu.serving import StreamingRecognizer
    from early_exit_tpu.training import checkpoint
    from early_exit_tpu.utils import WerAccumulator

    extra = {"--chunk_s": 1.0, "--left_s": 2.0, "--right_s": 0.32,
             "--n_exit": None, "--causal_attention": 0.0}
    argv = list(sys.argv[1:] if argv is None else argv)
    for k in list(extra):
        if k in argv:
            i = argv.index(k)
            extra[k] = float(argv[i + 1])
            del argv[i:i + 2]
    if "--decoder_mode" not in argv:
        argv = ["--decoder_mode", "ctc"] + argv

    args, model_cfg, train_cfg, audio_cfg, tokenizer = get_args(argv)
    model = build_model(model_cfg)
    params, model_state = model.init(jax.random.PRNGKey(args.seed),
                                     model_cfg)
    if args.load_model_path:
        params, model_state = checkpoint.load_model_file(
            args.load_model_path, params, model_state)
        print(f"loaded {args.load_model_path}")

    if args.synthetic_data:
        ds = SyntheticDataset(n_items=16, seed=args.seed + 7)
    else:
        ds = LibriSpeechDataset(args.data_root,
                                args.eval_splits.split(",")[0])

    n_exit = int(extra["--n_exit"]) if extra["--n_exit"] else \
        model_cfg.n_enc_exits
    jfull = jax.jit(lambda p, s, f, l: model.apply(p, s, f, l, model_cfg,
                                                   train=False))

    stream_wer, full_wer = WerAccumulator(), WerAccumulator()
    agree = 0
    chunk_times = []
    n = min(len(ds), 16)
    for i in range(n):
        utt = ds[i]
        ref = text_mod.clean_infer_label(utt.transcript)
        if ref is None:
            continue

        rec = StreamingRecognizer(params, model_state, model_cfg,
                                  audio_cfg, tokenizer,
                                  chunk_s=extra["--chunk_s"],
                                  left_s=extra["--left_s"],
                                  right_s=extra["--right_s"],
                                  n_exit=n_exit,
                                  causal_attention=bool(
                                      extra["--causal_attention"]))
        # feed in chunk-sized pieces, timing each accept (compute only)
        step = max(int(extra["--chunk_s"] * utt.sample_rate), 1)
        text_parts = []
        for s0 in range(0, len(utt.waveform), step):
            t0 = time.perf_counter()
            text_parts.append(
                rec.accept_waveform(utt.waveform[s0:s0 + step]))
            chunk_times.append(time.perf_counter() - t0)
        text_parts.append(rec.finish())
        # score the full id sequence decoded at once (joining per-chunk
        # strings would lose subword word-boundary marks mid-word)
        hyp_stream = rec.transcript.strip().lower()

        wav = jnp.asarray(np.asarray(utt.waveform, np.float32)[None])
        lengths = frontend.mel_lengths(jnp.asarray([len(utt.waveform)]),
                                       audio_cfg.hop_length)
        feats = frontend.mel_spectrogram(wav, audio_cfg)
        logp, sub_len, _ = jfull(params, model_state, feats, lengths)
        toks, cnt = ctc.greedy_decode(logp[n_exit - 1], sub_len)
        ids = [int(t) for t in np.asarray(toks[0])[:int(cnt[0])]]
        hyp_full = tokenizer.decode(ids).strip().lower()

        stream_wer.add(ref.lower(), hyp_stream)
        full_wer.add(ref.lower(), hyp_full)
        agree += hyp_stream == hyp_full
        print(f"[{i}] ref : {ref.lower()}")
        print(f"[{i}] strm: {hyp_stream}")
        print(f"[{i}] full: {hyp_full}")

    # drop the first (compile) measurement from the latency stats
    warm = sorted(chunk_times[1:]) or chunk_times
    if not warm:
        print(json.dumps({"utts": 0, "error": "no decodable utterances"}))
        return
    print(json.dumps({
        "utts": stream_wer.utterances, "exit": n_exit,
        "chunk_s": extra["--chunk_s"], "left_s": extra["--left_s"],
        "right_s": extra["--right_s"],
        "causal_attention": bool(extra["--causal_attention"]),
        "stream_wer_pct": round(100 * stream_wer.value, 2),
        "full_wer_pct": round(100 * full_wer.value, 2),
        "exact_transcript_agreement": f"{agree}/{stream_wer.utterances}",
        "chunk_compute_ms_p50": round(1e3 * warm[len(warm) // 2], 2),
        "chunk_compute_ms_p95": round(1e3 * warm[int(len(warm) * .95)], 2),
    }))


if __name__ == "__main__":
    main()
