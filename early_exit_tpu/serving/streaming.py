"""Streaming (chunked) inference for production serving.

Beyond-reference capability: the reference decodes whole utterances only
(inference.py:18-233). Here audio is fed incrementally and transcripts
are emitted per chunk with bounded latency, using the SAME trained
early-exit Conformer checkpoints:

- the signal is processed in fixed windows  [left ctx | chunk | right ctx]
  (sizes in subsampled frames; one jitted program, static shapes);
- the ×4 conv subsampling is exactly local, so with the window aligned to
  a multiple of 4 mel frames every chunk-region subsampled frame has the
  SAME receptive field as in the full-utterance forward — the only
  approximation is attention truncated to the window (controlled by
  `left_s`/`right_s`);
- positional encodings use GLOBAL stream positions (nn.sinusoidal_pe_at),
  so window placement matches full-utterance PE;
- greedy CTC decoding carries the last emitted token across chunk
  boundaries so repeats collapse correctly at the seam.

Latency per emitted word ≈ chunk_s + right_s + model time. With
chunk == whole utterance and no context the output is bit-identical to
the batch inference path (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import AudioConfig, ModelConfig
from early_exit_tpu.models import conformer, subsampling
from early_exit_tpu.models.early_conformer import _conformer_cfg
from early_exit_tpu.nn import core as nn
from early_exit_tpu.ops import frontend


def _sub_frames_for_mel(w: int) -> int:
    """Subsampled frames produced by W mel frames (two VALID k=3 s=2)."""
    return ((w - 3) // 2 + 1 - 3) // 2 + 1


def _slice_weights(params, state, mcfg: ModelConfig, n_exit: int):
    """Device slices of the trunk up to `n_exit` + that exit's head."""
    n_layers = n_exit * mcfg.n_enc_layers_per_exit
    sl = slice(0, n_layers)
    return (params["subsample"],
            jax.tree_util.tree_map(lambda a: a[sl], params["blocks"]),
            jax.tree_util.tree_map(lambda a: a[sl], state["blocks"]),
            jax.tree_util.tree_map(lambda a: a[n_exit - 1],
                                   params["heads"]))


# One compiled window program per (config, geometry) — recognizers are
# cheap per-stream objects and must share compilations (a serving process
# creates one per connection).
_WINDOW_CACHE: dict = {}


def _embed_window(mcfg: ModelConfig, acfg: AudioConfig, Ls: int, Cs: int,
                  causal_attention: bool, sub_params, wav_win, pos0,
                  n_valid_sub):
    """Shared window preamble: mel → subsample → global-position PE →
    validity mask → causal chunk mask. Returns (x, mask, attn_mask, ccfg).

    The validity mask marks frames at negative global positions
    (pre-stream padding of early windows) invalid too, exactly as
    training masks padding. It is therefore NOT a prefix mask — the
    fused Pallas block (which collapses masks to prefix lengths) is
    disabled for window programs below."""
    import dataclasses

    mel_method = acfg.mel_method if acfg.mel_method in ("fft", "dft") \
        else "fft"
    feats = frontend.mel_spectrogram(wav_win, acfg, method=mel_method)
    x = subsampling.conv_subsample_apply(
        sub_params, feats, compute_dtype=mcfg.dtype)          # (S, K, D)
    s, k = x.shape[0], x.shape[1]
    pos = pos0[:, None] + jnp.arange(k)[None, :]              # (S, K)
    pe = nn.sinusoidal_pe_at(pos.reshape(-1), mcfg.d_model)
    x = x.astype(jnp.float32) + pe.reshape(s, k, -1)
    mask = (pos >= 0) & (jnp.arange(k)[None, :]
                         < n_valid_sub[:, None])              # (S, K)
    x = jnp.where(mask[..., None], x, 0.0).astype(mcfg.rdtype)
    attn_mask = None
    if causal_attention:
        # reproduce the dynamic-chunk TRAINING pattern
        # (trainer.make_chunk_mask) inside the window using GLOBAL chunk
        # ids: no frame ever attends a LATER chunk — including
        # left-context rows, whose deeper-layer values feed the chunk
        # region. Right-context audio still reaches the (local)
        # convolutions, which training never masked. Global chunk of
        # window index i is g + (i - Ls)//Cs — the additive g cancels in
        # comparisons, so one (K, K) mask serves every stream and
        # window position.
        qc = (jnp.arange(k) - Ls) // Cs
        attn_mask = qc[None, :] <= qc[:, None]
    ccfg = dataclasses.replace(_conformer_cfg(mcfg), fused_block=False)
    return x, mask, attn_mask, ccfg


def _window_fn(mcfg: ModelConfig, acfg: AudioConfig, Ls: int, Cs: int,
               blank: int, causal_attention: bool,
               with_confidence: bool = False,
               gate_score: str = "maxprob"):
    key = (repr(mcfg), repr(acfg), Ls, Cs, blank, causal_attention,
           with_confidence, gate_score)
    if key in _WINDOW_CACHE:
        return _WINDOW_CACHE[key]

    @jax.jit
    def window_forward(sub_params, block_params, block_state, head,
                       wav_win, pos0, n_valid_sub):
        """wav_win (S, win_samples) — one row per stream; pos0 (S,):
        global sub index of each window's first sub frame; n_valid_sub
        (S,): valid sub frames per window counted from the stream start.
        Returns each chunk region's best-path ids (S, Cs)."""
        x, mask, attn_mask, ccfg = _embed_window(
            mcfg, acfg, Ls, Cs, causal_attention, sub_params, wav_win,
            pos0, n_valid_sub)
        h, _ = conformer.stack_apply(block_params, block_state, x,
                                     mask, ccfg, train=False,
                                     attn_mask=attn_mask)
        logits = nn.linear(head, h, compute_dtype=mcfg.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        best = jnp.argmax(logp, axis=-1)                      # (S, K)
        best = jnp.where(mask, best, blank)
        if not with_confidence:
            return best[:, Ls:Ls + Cs]
        # the gate metric (mean max-prob over valid chunk frames) comes
        # from the one shared implementation; all-invalid chunks report
        # 1.0 so the gate never escalates for padding
        from early_exit_tpu.models.early_exit_gate import exit_confidence
        cmask = mask[:, Ls:Ls + Cs]
        conf = jnp.where(jnp.any(cmask, axis=1),
                         exit_confidence(logp[:, Ls:Ls + Cs], cmask,
                                         gate_score), 1.0)
        return best[:, Ls:Ls + Cs], conf

    _WINDOW_CACHE[key] = window_forward
    return window_forward


def _window_fn_all_exits(mcfg: ModelConfig, acfg: AudioConfig, Ls: int,
                         Cs: int, blank: int, causal_attention: bool):
    """Window program decoding EVERY exit from one trunk pass — the
    streaming analogue of the reference's per-exit eval contract
    (inference.py:44-48 decodes each exit)."""
    key = ("all_exits", repr(mcfg), repr(acfg), Ls, Cs, blank,
           causal_attention)
    if key in _WINDOW_CACHE:
        return _WINDOW_CACHE[key]

    @jax.jit
    def window_forward(sub_params, block_params, block_state, heads,
                       wav_win, pos0, n_valid_sub):
        """Returns (E, S, Cs) best-path ids — one row set per exit."""
        x, mask, attn_mask, ccfg = _embed_window(
            mcfg, acfg, Ls, Cs, causal_attention, sub_params, wav_win,
            pos0, n_valid_sub)
        _, _, layer_outs = conformer.stack_apply(
            block_params, block_state, x, mask, ccfg, train=False,
            collect_outputs=True, attn_mask=attn_mask)
        exit_idx = (jnp.arange(1, mcfg.n_enc_exits + 1)
                    * mcfg.n_enc_layers_per_exit - 1)
        exit_hidden = jnp.take(layer_outs, exit_idx, axis=0)  # (E,S,K,D)

        def one(head_p, h):
            logits = nn.linear(head_p, h, compute_dtype=mcfg.dtype)
            return jnp.argmax(logits.astype(jnp.float32), axis=-1)
        best = jax.vmap(one)(heads, exit_hidden)              # (E, S, K)
        best = jnp.where(mask[None], best, blank)
        return best[:, :, Ls:Ls + Cs]

    _WINDOW_CACHE[key] = window_forward
    return window_forward


class StreamingRecognizer:
    """Incremental recognizer over one audio stream.

    Args:
      params/state/model_cfg: a trained early_conformer checkpoint.
      audio_cfg: frontend config (16 kHz LibriSpeech default).
      tokenizer: optional — with one, `accept_waveform` returns text;
        without, token id lists.
      chunk_s: emission granularity (seconds of audio per chunk).
      left_s/right_s: attention context kept around each chunk. right_s
        adds lookahead latency; left_s only memory/compute.
      n_exit: which exit decodes the stream (1-based; default deepest) —
        pick a lower exit for cheaper incremental decoding.
      causal_attention: apply the --dynamic_chunk_training attention
        pattern inside the window (no frame attends a later chunk;
        right-context audio still feeds the convolutions) — use with
        checkpoints trained that way, left_s = chunk_left_context ×
        chunk_s.

    Input precision note: this path consumes float waveforms as given,
    while the training pipeline ships int16-quantized audio (-96 dB
    quantization, lossless for 16-bit sources — data/pipeline.py). For
    16-bit-origin audio the two are identical; synthetic float audio
    differs below the quantization floor.
    """

    def __init__(self, params, state, model_cfg: ModelConfig,
                 audio_cfg: Optional[AudioConfig] = None, tokenizer=None, *,
                 chunk_s: float = 1.0, left_s: float = 2.0,
                 right_s: float = 0.32, n_exit: Optional[int] = None,
                 blank: Optional[int] = None, causal_attention: bool = False,
                 exit_threshold: Optional[float] = None, fast_exit: int = 1,
                 gate_score: str = "maxprob", all_exits: bool = False,
                 _shared_weights=None, _shared_fast_weights=None):
        self.acfg = audio_cfg or AudioConfig()
        self.mcfg = model_cfg
        self.tok = tokenizer
        self.blank = model_cfg.blank_id if blank is None else blank
        hop = self.acfg.hop_length
        sub_s = 4 * hop / self.acfg.sample_rate     # seconds per sub frame
        self.Cs = max(int(round(chunk_s / sub_s)), 1)
        self.Ls = max(int(round(left_s / sub_s)), 0)
        self.Rs = max(int(round(right_s / sub_s)), 0)
        K = self.Ls + self.Cs + self.Rs
        self.W = 4 * K + 5                          # window mel frames
        self.win_samples = (self.W - 1) * hop
        self.n_exit = n_exit or model_cfg.n_enc_exits

        self.all_exits = all_exits
        if all_exits:
            # decode EVERY exit from one trunk pass (per-exit eval
            # contract); incompatible with slicing/gating
            if exit_threshold is not None or n_exit is not None:
                raise ValueError("all_exits decodes every exit; drop "
                                 "n_exit/exit_threshold")
            self._sub_params = params["subsample"]
            self._block_params = params["blocks"]
            self._block_state = state["blocks"]
            self._head = params["heads"]
            self._window_forward = _window_fn_all_exits(
                model_cfg, self.acfg, self.Ls, self.Cs, self.blank,
                causal_attention)
        elif _shared_weights is not None:
            # StreamPool passes one set of sliced weights for every
            # stream — per-stream device copies would multiply HBM use
            # by the stream count
            (self._sub_params, self._block_params, self._block_state,
             self._head) = _shared_weights
        else:
            (self._sub_params, self._block_params, self._block_state,
             self._head) = _slice_weights(params, state, model_cfg,
                                          self.n_exit)
        if not all_exits:
            self._window_forward = _window_fn(model_cfg, self.acfg,
                                              self.Ls, self.Cs,
                                              self.blank,
                                              causal_attention)
        self._n_out = self.n_exit if all_exits else 1
        # confidence-gated dynamic exit (the framework's early-exit
        # thesis applied to serving): each chunk first decodes at
        # `fast_exit`; only chunks whose gate confidence is below
        # `exit_threshold` re-run through the deep trunk
        if exit_threshold is not None and not (1 <= fast_exit
                                               < self.n_exit):
            # single-exit serving (or fast==deep): gating is meaningless
            print(f"streaming: exit_threshold ignored (fast_exit="
                  f"{fast_exit} must be < n_exit={self.n_exit})")
            exit_threshold = None
        self.exit_threshold = exit_threshold
        self.gate_score = gate_score
        self.fast_exit = fast_exit
        self.exits_run: List[int] = []     # per-chunk exit actually used
        if exit_threshold is not None:
            self._fast_weights = (_shared_fast_weights
                                  or _slice_weights(params, state,
                                                    model_cfg, fast_exit))
            self._fast_forward = _window_fn(model_cfg, self.acfg, self.Ls,
                                            self.Cs, self.blank,
                                            causal_attention,
                                            with_confidence=True,
                                            gate_score=gate_score)
        self._buf: List[np.ndarray] = []
        self._buf_offset = 0          # stream index of _buf[0][0]
        self._n_samples = 0
        self._next_chunk = 0          # next chunk index (in chunks)
        # per-output-head collapse carry and emitted ids (one output in
        # the default mode, one per exit under all_exits)
        self._last_tokens = [-1] * self._n_out
        self._ids_out: List[List[int]] = [[] for _ in range(self._n_out)]
        self._finished = False

    # -- internals ---------------------------------------------------------

    def _window_bounds(self, g: int):
        """Sample range of the window for chunk g (may exceed stream)."""
        a_mel = 4 * (g * self.Cs - self.Ls)       # window start, mel frames
        s0 = a_mel * self.acfg.hop_length
        return s0, s0 + self.win_samples

    def _have(self) -> np.ndarray:
        if len(self._buf) > 1:
            self._buf = [np.concatenate(self._buf)]
        return self._buf[0] if self._buf else np.zeros((0,), np.float32)

    def _trim(self) -> None:
        """Drop samples no future window can need — memory stays O(window)
        regardless of stream length."""
        keep_from, _ = self._window_bounds(self._next_chunk)
        keep_from = max(keep_from, 0)
        if keep_from > self._buf_offset:
            wav = self._have()
            self._buf = [wav[keep_from - self._buf_offset:]]
            self._buf_offset = keep_from

    def _total_sub_frames(self) -> int:
        """Valid sub frames of the whole stream, under the MODEL's length
        convention: the reference rule (clamp(len/4), the training
        default) yields 1-2 more frames than exact conv arithmetic, and
        trained models place utterance-final tokens there — truncating
        to the true length clips transcript tails."""
        mel = 1 + self._n_samples // self.acfg.hop_length
        if self.mcfg.length_mode == "reference":
            return max(mel // 4, 0)
        return max(_sub_frames_for_mel(mel), 0)

    def _window_args(self, g: int):
        """Host-side window assembly for chunk g: (seg, pos0)."""
        s0, s1 = self._window_bounds(g)
        wav = self._have()
        lo = max(s0, 0) - self._buf_offset
        hi = min(s1 - self._buf_offset, len(wav))
        seg = wav[lo:hi]
        left_pad = max(-s0, 0)
        right_pad = self.win_samples - left_pad - len(seg)
        seg = np.pad(seg.astype(np.float32), (left_pad, max(right_pad, 0)))
        return seg, g * self.Cs - self.Ls

    def _advance(self, best_row: np.ndarray) -> List[int]:
        """Collapse one chunk's best-path ids across the seam; advance.

        best_row: (Cs,) in the default mode, (n_out, Cs) under
        all_exits. Returns the DEEPEST output's new ids."""
        rows = best_row if best_row.ndim == 2 else best_row[None]
        out_last = []
        for e in range(self._n_out):
            out = []
            last = self._last_tokens[e]
            for t in rows[e]:
                t = int(t)
                if t != self.blank and t != last:
                    out.append(t)
                last = t
            self._last_tokens[e] = last
            self._ids_out[e].extend(out)
            out_last = out
        self._next_chunk += 1
        self._trim()
        return out_last

    def _run_chunk(self, g: int, n_valid_sub: int):
        seg, pos0 = self._window_args(g)
        wav = jnp.asarray(seg[None])
        p0 = jnp.asarray([pos0], jnp.int32)
        nv = jnp.asarray([n_valid_sub], jnp.int32)
        if self.exit_threshold is not None:
            fbest, conf = self._fast_forward(*self._fast_weights, wav,
                                             p0, nv)
            if float(conf[0]) >= self.exit_threshold:
                self.exits_run.append(self.fast_exit)
                return self._advance(np.asarray(fbest)[0])
        best = np.asarray(self._window_forward(
            self._sub_params, self._block_params, self._block_state,
            self._head, wav, p0, nv))
        best = best[:, 0] if self.all_exits else best[0]
        if self.exit_threshold is not None:
            self.exits_run.append(self.n_exit)
        return self._advance(best)

    def _emit(self, ids: List[int]):
        if self.tok is None:
            return ids
        return self.tok.decode(ids)

    # -- public API --------------------------------------------------------

    def accept_waveform(self, samples) -> "str | List[int]":
        """Feed more audio; returns newly finalized text (or token ids)."""
        assert not self._finished, "stream already finished"
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf.append(samples)
        self._n_samples += len(samples)
        new: List[int] = []
        # a chunk is ready once every sample its window needs has arrived
        while self._chunk_ready():
            # mid-stream: the whole window is valid context
            new += self._run_chunk(self._next_chunk,
                                   self.Ls + self.Cs + self.Rs)
        return self._emit(new)

    def _chunk_ready(self) -> bool:
        _, s1 = self._window_bounds(self._next_chunk)
        return s1 <= self._n_samples

    def finish(self) -> "str | List[int]":
        """Flush: decode the remaining tail with zero-padded lookahead."""
        assert not self._finished, "stream already finished"
        self._finished = True
        total = self._total_sub_frames()
        new: List[int] = []
        while self._next_chunk * self.Cs < total:
            g = self._next_chunk
            # valid sub frames inside this window
            n_valid = min(total - (g * self.Cs - self.Ls),
                          self.Ls + self.Cs + self.Rs)
            new += self._run_chunk(g, n_valid)
        return self._emit(new)

    @property
    def ids(self) -> List[int]:
        """Deepest output's ids (every mode)."""
        return list(self._ids_out[-1])

    @property
    def transcript(self):
        return self._emit(self._ids_out[-1])

    def ids_at(self, n_exit: int) -> List[int]:
        """Per-exit ids (all_exits mode; 1-based)."""
        if not self.all_exits:
            raise ValueError("ids_at requires all_exits=True")
        return list(self._ids_out[n_exit - 1])

    def transcript_at(self, n_exit: int):
        return self._emit(self.ids_at(n_exit))


class StreamPool:
    """Fixed-capacity pool of independent audio streams decoded by ONE
    batched window program per round — the production serving shape: a
    server holds a pool per device, `feed`s audio as it arrives per
    connection, and `poll`s to run every stream's ready chunk in a single
    device dispatch (rows for idle streams are masked, not recompiled).

    All streams share geometry/config/checkpoint. Results are identical
    to per-stream StreamingRecognizers (pinned by tests)."""

    def __init__(self, n_streams: int, params, state,
                 model_cfg: ModelConfig,
                 audio_cfg: Optional[AudioConfig] = None, tokenizer=None,
                 **kwargs):
        assert n_streams >= 1
        shared = None
        if not kwargs.get("all_exits"):
            shared = _slice_weights(params, state, model_cfg,
                                    kwargs.get("n_exit")
                                    or model_cfg.n_enc_exits)
        shared_fast = None
        if kwargs.get("exit_threshold") is not None:
            shared_fast = _slice_weights(params, state, model_cfg,
                                         kwargs.get("fast_exit", 1))
        self._ctor = (params, state, model_cfg, audio_cfg, tokenizer,
                      shared, shared_fast, dict(kwargs))
        self.recs = [StreamingRecognizer(params, state, model_cfg,
                                         audio_cfg, tokenizer,
                                         _shared_weights=shared,
                                         _shared_fast_weights=shared_fast,
                                         **kwargs)
                     for _ in range(n_streams)]
        r0 = self.recs[0]
        self._fwd = r0._window_forward
        self._K = r0.Ls + r0.Cs + r0.Rs

    def reset(self, stream_id: int) -> None:
        """Recycle one slot for a NEW stream (production churn: a
        connection closed, another takes its place mid-round). Shared
        sliced weights and the compiled window program are reused, so a
        reset costs only recognizer bookkeeping — no recompilation."""
        (params, state, model_cfg, audio_cfg, tokenizer, shared,
         shared_fast, kwargs) = self._ctor
        self.recs[stream_id] = StreamingRecognizer(
            params, state, model_cfg, audio_cfg, tokenizer,
            _shared_weights=shared, _shared_fast_weights=shared_fast,
            **kwargs)

    def warmup(self) -> None:
        """Trace/compile every device program `poll()` and `finish()` can
        dispatch — the batched (S, win) round and the single-row (1, win)
        tail flush, fast and deep legs alike — so the first real round
        never pays the ~2 s trace-plus-cache-hit tail measured as the
        churn p99 (BENCH_NOTES.md). Rows are fully masked (n_valid=0):
        no stream state is read or advanced."""
        r0 = self.recs[0]
        for S in (len(self.recs), 1):
            wav = jnp.zeros((S, r0.win_samples), jnp.float32)
            p0 = jnp.zeros((S,), jnp.int32)
            nv = jnp.zeros((S,), jnp.int32)
            if r0.exit_threshold is not None:
                jax.block_until_ready(self._fwd_fast(wav, p0, nv))
            jax.block_until_ready(self._fwd(
                r0._sub_params, r0._block_params, r0._block_state,
                r0._head, wav, p0, nv))

    def feed(self, stream_id: int, samples) -> None:
        """Buffer audio for one stream (no compute until poll())."""
        rec = self.recs[stream_id]
        assert not rec._finished, "stream already finished"
        samples = np.asarray(samples, np.float32).reshape(-1)
        rec._buf.append(samples)
        rec._n_samples += len(samples)

    def poll(self) -> dict:
        """Run ready chunks, one batched dispatch per round, until no
        stream has a complete window. Returns {stream_id: newly emitted
        text-or-ids} for streams that produced output."""
        r0 = self.recs[0]
        emitted: dict = {}
        while True:
            ready = [i for i, rec in enumerate(self.recs)
                     if not rec._finished and rec._chunk_ready()]
            if not ready:
                break
            S = len(self.recs)
            wav = np.zeros((S, r0.win_samples), np.float32)
            pos0 = np.zeros((S,), np.int32)
            n_valid = np.zeros((S,), np.int32)    # idle rows: all masked
            for i in ready:
                seg, p0 = self.recs[i]._window_args(
                    self.recs[i]._next_chunk)
                wav[i], pos0[i], n_valid[i] = seg, p0, self._K
            jw, jp, jn = (jnp.asarray(wav), jnp.asarray(pos0),
                          jnp.asarray(n_valid))
            deep = ready
            if r0.exit_threshold is not None:
                # gated: one fast-exit dispatch for all ready rows; only
                # unconfident rows take the second (deep-trunk) dispatch
                fbest, conf = self._fwd_fast(jw, jp, jn)
                fbest, conf = np.asarray(fbest), np.asarray(conf)
                deep = []
                for i in ready:
                    if conf[i] >= r0.exit_threshold:
                        self.recs[i].exits_run.append(r0.fast_exit)
                        out = self.recs[i]._advance(fbest[i])
                        if out:
                            emitted.setdefault(i, []).extend(out)
                    else:
                        deep.append(i)
                if not deep:
                    continue
                keep = np.zeros_like(n_valid)
                for i in deep:
                    keep[i] = n_valid[i]
                jn = jnp.asarray(keep)
            best = np.asarray(self._fwd(
                r0._sub_params, r0._block_params, r0._block_state,
                r0._head, jw, jp, jn))
            for i in deep:
                if r0.exit_threshold is not None:
                    self.recs[i].exits_run.append(r0.n_exit)
                row = best[:, i] if r0.all_exits else best[i]
                out = self.recs[i]._advance(row)
                if out:
                    emitted.setdefault(i, []).extend(out)
        return {i: self.recs[i]._emit(ids) for i, ids in emitted.items()}

    def _fwd_fast(self, jw, jp, jn):
        r0 = self.recs[0]
        return r0._fast_forward(*r0._fast_weights, jw, jp, jn)

    def finish(self, stream_id: int):
        """Flush one stream's tail (single-row dispatch)."""
        return self.recs[stream_id].finish()

    def transcript(self, stream_id: int):
        return self.recs[stream_id].transcript
