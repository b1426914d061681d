"""Streaming (chunked) inference — serving/streaming.py.

Beyond-reference capability (the reference decodes whole utterances
only). Pinned here:
- global-position sinusoidal PE equals the table path,
- a single whole-utterance chunk reproduces the batch inference path
  exactly (same mel, subsample receptive fields, PE, mask, decode),
- results are invariant to how the audio is sliced when fed,
- the flush path emits the stream tail.
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import AudioConfig, ModelConfig
from early_exit_tpu.models import early_conformer
from early_exit_tpu.nn import core as nn_core
from early_exit_tpu.ops import ctc, frontend
from early_exit_tpu.serving import StreamingRecognizer

CFG = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                  n_enc_exits=2, n_enc_layers_per_exit=1,
                  depthwise_kernel_size=7, vocab_size=32,
                  compute_dtype="float32", length_mode="true")
ACFG = AudioConfig()


@pytest.fixture(scope="module")
def model():
    params, state = early_conformer.init(jax.random.PRNGKey(0), CFG)
    return params, state


def _wav(seconds, seed=0):
    n = int(seconds * ACFG.sample_rate)
    return (0.1 * np.random.RandomState(seed).randn(n)).astype(np.float32)


def test_sinusoidal_pe_at_matches_table():
    table = nn_core.sinusoidal_pe(64, 32)
    at = nn_core.sinusoidal_pe_at(jnp.arange(10, 20), 32)
    np.testing.assert_allclose(np.asarray(at), np.asarray(table)[10:20],
                               rtol=1e-6, atol=1e-6)


def test_whole_utterance_chunk_equals_batch_path(model):
    """chunk >= utterance, no context -> bit-identical to the batch
    inference path on the identically padded waveform."""
    params, state = model
    wav = _wav(1.0)

    rec = StreamingRecognizer(params, state, CFG, ACFG,
                              chunk_s=2.0, left_s=0.0, right_s=0.0)
    rec.accept_waveform(wav)
    got = rec.finish()

    # batch path over the same padded window
    padded = np.zeros((rec.win_samples,), np.float32)
    padded[:len(wav)] = wav
    feats = frontend.mel_spectrogram(jnp.asarray(padded[None]), ACFG)
    lengths = frontend.mel_lengths(jnp.asarray([len(wav)]), ACFG.hop_length)
    logp, sub_len, _ = early_conformer.apply(params, state, feats, lengths,
                                             CFG, train=False)
    toks, n = ctc.greedy_decode(logp[-1], sub_len)
    want = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]
    assert got == want
    assert rec.ids == want


def test_feeding_granularity_is_irrelevant(model):
    params, state = model
    wav = _wav(3.0, seed=1)

    def run(pieces):
        rec = StreamingRecognizer(params, state, CFG, ACFG,
                                  chunk_s=0.5, left_s=1.0, right_s=0.2)
        out = []
        for p in pieces:
            out += rec.accept_waveform(p)
        out += rec.finish()
        assert out == rec.ids
        return out

    all_at_once = run([wav])
    tiny_pieces = run(np.array_split(wav, 37))
    assert all_at_once == tiny_pieces
    # several chunks actually ran (multi-window path exercised)


def test_flush_emits_tail(model):
    """Audio shorter than one chunk window still decodes on finish()."""
    params, state = model
    wav = _wav(0.3, seed=2)
    rec = StreamingRecognizer(params, state, CFG, ACFG,
                              chunk_s=1.0, left_s=1.0, right_s=0.2)
    mid = rec.accept_waveform(wav)
    assert mid == []                      # window not yet complete
    rec.finish()
    assert rec._next_chunk >= 1           # tail was processed


def test_early_exit_stream_runs(model):
    """n_exit=1 decodes through the first exit only (cheap serving)."""
    params, state = model
    wav = _wav(1.5, seed=3)
    rec = StreamingRecognizer(params, state, CFG, ACFG,
                              chunk_s=0.5, left_s=0.5, right_s=0.2,
                              n_exit=1)
    rec.accept_waveform(wav)
    rec.finish()
    assert all(0 < t < CFG.vocab_size for t in rec.ids)


def test_streaming_with_context_approximates_full(model):
    """With generous context the chunked decode matches the full-utterance
    decode on most frames (attention truncation is the only difference)."""
    params, state = model
    wav = _wav(4.0, seed=4)

    rec = StreamingRecognizer(params, state, CFG, ACFG,
                              chunk_s=1.0, left_s=2.0, right_s=0.5)
    rec.accept_waveform(wav)
    rec.finish()
    got = rec.ids

    feats = frontend.mel_spectrogram(jnp.asarray(wav[None]), ACFG)
    lengths = frontend.mel_lengths(jnp.asarray([len(wav)]), ACFG.hop_length)
    logp, sub_len, _ = early_conformer.apply(params, state, feats, lengths,
                                             CFG, train=False)
    toks, n = ctc.greedy_decode(logp[-1], sub_len)
    want = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]

    # edit distance as a fraction of the reference length
    import numpy as _np
    D = _np.zeros((len(got) + 1, len(want) + 1), int)
    D[:, 0] = _np.arange(len(got) + 1)
    D[0, :] = _np.arange(len(want) + 1)
    for i in range(1, len(got) + 1):
        for j in range(1, len(want) + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                          D[i - 1, j - 1] + (got[i - 1] != want[j - 1]))
    assert len(want) > 0
    assert D[-1, -1] / len(want) < 0.35, (got, want)


def test_buffer_is_trimmed_on_long_streams(model):
    """Memory stays O(window) regardless of stream length."""
    params, state = model
    rec = StreamingRecognizer(params, state, CFG, ACFG,
                              chunk_s=0.5, left_s=0.5, right_s=0.2)
    for seed in range(6):
        rec.accept_waveform(_wav(2.0, seed=seed))
    held = sum(len(b) for b in rec._buf)
    assert held < 3 * rec.win_samples
    assert rec._buf_offset > 0


def test_causal_attention_mode_runs_and_differs(model):
    """causal_attention=True (dynamic-chunk-trained checkpoints) masks
    the right tail from attention while convs still see it."""
    params, state = model
    wav = _wav(3.0, seed=5)

    def run(causal):
        rec = StreamingRecognizer(params, state, CFG, ACFG,
                                  chunk_s=0.5, left_s=1.0, right_s=0.5,
                                  causal_attention=causal)
        rec.accept_waveform(wav)
        rec.finish()
        return rec.ids

    a, b = run(False), run(True)
    assert a != b          # the mask is actually engaged


def test_stream_pool_matches_independent_recognizers(model):
    """One batched dispatch per round == S independent recognizers."""
    from early_exit_tpu.serving import StreamPool

    params, state = model
    wavs = [_wav(2.0 + 0.7 * i, seed=10 + i) for i in range(3)]

    solo = []
    for w in wavs:
        rec = StreamingRecognizer(params, state, CFG, ACFG,
                                  chunk_s=0.5, left_s=1.0, right_s=0.2)
        rec.accept_waveform(w)
        rec.finish()
        solo.append(rec.ids)

    pool = StreamPool(3, params, state, CFG, ACFG,
                      chunk_s=0.5, left_s=1.0, right_s=0.2)
    # interleave feeding in uneven pieces, polling as audio arrives
    pieces = [np.array_split(w, 5) for w in wavs]
    for j in range(5):
        for i in range(3):
            pool.feed(i, pieces[i][j])
        pool.poll()
    for i in range(3):
        pool.finish(i)
    assert [pool.recs[i].ids for i in range(3)] == solo


def test_reference_length_mode_extends_stream_total():
    """Under the reference clamp(len/4) rule (the training default) the
    stream total is 1-2 frames longer than exact conv arithmetic —
    trained models place utterance-final tokens there
    (tail-truncation regression guard)."""
    params, state = early_conformer.init(
        jax.random.PRNGKey(0),
        ModelConfig(**{**CFG.__dict__, "length_mode": "reference"}))
    ref_cfg = ModelConfig(**{**CFG.__dict__, "length_mode": "reference"})
    a = StreamingRecognizer(params, state, CFG, ACFG, chunk_s=1.0)
    b = StreamingRecognizer(params, state, ref_cfg, ACFG, chunk_s=1.0)
    for rec in (a, b):
        rec._n_samples = 3 * 16000
    assert b._total_sub_frames() > a._total_sub_frames()


def test_gated_streaming_threshold_extremes(model):
    """thr<=0: every chunk stays at fast_exit == fast-only streaming;
    thr>1: every chunk escalates == deep streaming."""
    params, state = model
    wav = _wav(3.0, seed=6)

    def run(**kw):
        rec = StreamingRecognizer(params, state, CFG, ACFG,
                                  chunk_s=0.5, left_s=1.0, right_s=0.2,
                                  **kw)
        rec.accept_waveform(wav)
        rec.finish()
        return rec

    fast_only = run(n_exit=1)
    deep_only = run(n_exit=2)
    always_fast = run(n_exit=2, exit_threshold=0.0, fast_exit=1)
    always_deep = run(n_exit=2, exit_threshold=1.01, fast_exit=1)
    assert always_fast.ids == fast_only.ids
    assert set(always_fast.exits_run) == {1}
    assert always_deep.ids == deep_only.ids
    assert set(always_deep.exits_run) == {2}


def test_gated_stream_pool_matches_solo(model):
    from early_exit_tpu.serving import StreamPool

    params, state = model
    wavs = [_wav(2.0 + 0.5 * i, seed=20 + i) for i in range(3)]
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2,
              n_exit=2, exit_threshold=0.05, fast_exit=1)

    solo = []
    for w in wavs:
        rec = StreamingRecognizer(params, state, CFG, ACFG, **kw)
        rec.accept_waveform(w)
        rec.finish()
        solo.append((rec.ids, rec.exits_run))

    pool = StreamPool(3, params, state, CFG, ACFG, **kw)
    for i, w in enumerate(wavs):
        pool.feed(i, w)
    pool.poll()
    for i in range(3):
        pool.finish(i)
    for i in range(3):
        assert (pool.recs[i].ids, pool.recs[i].exits_run) == solo[i]
    # (branch coverage for BOTH gate outcomes is pinned by
    # test_gated_streaming_threshold_extremes)


def test_all_exits_streaming_matches_single_exit_paths(model):
    """all_exits decodes every exit from ONE trunk pass; each exit's ids
    must equal the corresponding sliced single-exit recognizer."""
    params, state = model
    wav = _wav(2.5, seed=30)
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2)

    rec_all = StreamingRecognizer(params, state, CFG, ACFG,
                                  all_exits=True, **kw)
    rec_all.accept_waveform(wav)
    rec_all.finish()

    for e in (1, 2):
        rec = StreamingRecognizer(params, state, CFG, ACFG, n_exit=e, **kw)
        rec.accept_waveform(wav)
        rec.finish()
        assert rec_all.ids_at(e) == rec.ids, f"exit {e}"
    assert rec_all.ids == rec_all.ids_at(2)


def test_all_exits_stream_pool_matches_solo(model):
    from early_exit_tpu.serving import StreamPool

    params, state = model
    wavs = [_wav(1.5 + 0.4 * i, seed=40 + i) for i in range(2)]
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2, all_exits=True)

    solo = []
    for w in wavs:
        rec = StreamingRecognizer(params, state, CFG, ACFG, **kw)
        rec.accept_waveform(w)
        rec.finish()
        solo.append([rec.ids_at(e) for e in (1, 2)])

    pool = StreamPool(2, params, state, CFG, ACFG, **kw)
    for i, w in enumerate(wavs):
        pool.feed(i, w)
    pool.poll()
    for i in range(2):
        pool.finish(i)
        assert [pool.recs[i].ids_at(e) for e in (1, 2)] == solo[i]


def test_stream_pool_churn_mixed_lengths(model):
    """Production churn (VERDICT r2 item 8): ragged streams of different
    lengths join and leave mid-round via reset(); every completed stream
    (original and replacement) must match a solo recognizer bit-exact,
    and the recycled slot must reuse the compiled window program."""
    from early_exit_tpu.serving import StreamPool

    params, state = model
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2)

    def solo(w):
        rec = StreamingRecognizer(params, state, CFG, ACFG, **kw)
        rec.accept_waveform(w)
        rec.finish()
        return rec.ids

    first = [_wav(1.2 + 0.9 * i, seed=30 + i) for i in range(3)]
    replacement = [_wav(2.1, seed=40), _wav(1.4, seed=41)]
    want = {f"first{i}": solo(w) for i, w in enumerate(first)}
    want.update({f"repl{i}": solo(w) for i, w in enumerate(replacement)})

    pool = StreamPool(3, params, state, CFG, ACFG, **kw)
    fwd_before = pool._fwd
    got = {}
    pieces = [list(np.array_split(w, 4)) for w in first]
    tags = [f"first{i}" for i in range(3)]
    repl_queue = list(zip([f"repl{i}" for i in range(len(replacement))],
                          replacement))
    # drive rounds: feed a piece to every live stream, poll, and when a
    # stream runs out of audio finish it and recycle the slot
    for _ in range(32):
        for i in range(3):
            if pieces[i]:
                pool.feed(i, pieces[i].pop(0))
        pool.poll()
        for i in range(3):
            if tags[i] is not None and not pieces[i]:
                pool.finish(i)
                got[tags[i]] = pool.recs[i].ids
                tags[i] = None
                if repl_queue:
                    tag, w = repl_queue.pop(0)
                    pool.reset(i)
                    tags[i] = tag
                    pieces[i] = list(np.array_split(w, 3))
        if all(t is None for t in tags) and not repl_queue:
            break
    assert got == want
    assert pool._fwd is fwd_before     # no recompilation on churn


def test_stream_pool_churn_gated(model):
    """Churn with the gated (fast/deep escalation) pool: recycled slots
    still match solo gated recognizers, and escalation bookkeeping
    stays per-stream."""
    from early_exit_tpu.serving import StreamPool

    params, state = model
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2,
              exit_threshold=0.5, fast_exit=1)
    w_a, w_b = _wav(1.6, seed=50), _wav(1.1, seed=51)

    def solo(w):
        rec = StreamingRecognizer(params, state, CFG, ACFG, **kw)
        rec.accept_waveform(w)
        rec.finish()
        return rec.ids, list(rec.exits_run)

    ids_a, exits_a = solo(w_a)
    ids_b, exits_b = solo(w_b)

    pool = StreamPool(2, params, state, CFG, ACFG, **kw)
    pool.feed(0, w_a)
    pool.feed(1, _wav(0.9, seed=52))
    pool.poll()
    pool.finish(0)
    assert pool.recs[0].ids == ids_a
    assert pool.recs[0].exits_run == exits_a
    pool.reset(0)
    pool.feed(0, w_b)
    pool.poll()
    pool.finish(0)
    assert pool.recs[0].ids == ids_b
    assert pool.recs[0].exits_run == exits_b


def test_pool_load_test_smoke():
    """tools/pool_load_test.py --smoke: churn happens, JSON is sane."""
    import json
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, EET_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "pool_load_test.py"),
         "--smoke"], capture_output=True, text=True, timeout=290, env=env,
        cwd=repo)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["churned_streams"] > 0
    assert out["round_ms_p99"] >= out["round_ms_p50"] > 0


def test_streaming_int8_smoke(model):
    """ModelConfig.quantize='int8' flows through _conformer_cfg into the
    streaming recognizer (XLA int8 block path) and emits finite output."""
    import dataclasses

    params, state = model
    cfg8 = dataclasses.replace(CFG, quantize="int8")
    rec = StreamingRecognizer(params, state, cfg8, ACFG, chunk_s=0.5)
    out = rec.accept_waveform(_wav(1.2))
    out += rec.finish()
    assert all(isinstance(t, (int, np.integer)) for t in out)


def test_pool_warmup_pretraces_all_dispatch_shapes(model):
    """warmup() must (a) not disturb stream results, and (b) leave no
    program shape for poll()/finish() to trace later — the churn-p99
    mitigation (BENCH_NOTES.md)."""
    from early_exit_tpu.serving import StreamPool

    params, state = model
    kw = dict(chunk_s=0.5, left_s=1.0, right_s=0.2)
    wavs = [_wav(1.5 + 0.5 * i, seed=30 + i) for i in range(2)]

    def run(warm):
        pool = StreamPool(2, params, state, CFG, ACFG, **kw)
        if warm:
            pool.warmup()
        for i in range(2):
            pool.feed(i, wavs[i])
        pool.poll()
        return [pool.finish(i) or pool.recs[i].ids for i in range(2)]

    assert run(True) == run(False)

    # gated pools dispatch a second (fast-exit) program; after warmup,
    # a full poll+finish cycle must add zero new jit traces
    pool = StreamPool(2, params, state, CFG, ACFG,
                      exit_threshold=2.0, fast_exit=1, **kw)
    pool.warmup()
    progs = [pool._fwd, pool.recs[0]._fast_forward]
    sizes = [p._cache_size() for p in progs]
    for i in range(2):
        pool.feed(i, wavs[i])
    pool.poll()
    for i in range(2):
        pool.finish(i)
    assert [p._cache_size() for p in progs] == sizes
