"""The committed flagship bundle is internally consistent.

Round 4 shipped a checkpoint with a tokenizer it was never trained
with and bench published 102% WER on every exit without failing
(VERDICT r4 weak 1/4). These tests make that class of regression a CI
failure:

- the bundle is COMPLETE: checkpoint + calib + the bound tokenizer all
  present (an orphan checkpoint is itself a failure);
- the binding VERIFIES: the tokenizer file named in
  assets/flagship_calib.json exists and matches its recorded sha256;
- the bundle DECODES: one in-distribution utterance greedy-decoded at
  the final exit through the committed checkpoint + bound tokenizer
  yields text close to the transcript (a swapped tokenizer maps every
  id to the wrong piece and fails this immediately).

Reference parallel: util/conf.py:473-474 — the reference hardcodes one
artifact so its binding can never drift; ours is recorded + verified.
"""

import hashlib
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "assets", "flagship_ckpt")
CALIB = os.path.join(REPO, "assets", "flagship_calib.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="no committed flagship checkpoint")


def test_bundle_is_complete():
    assert os.path.exists(CALIB), (
        "assets/flagship_ckpt is committed without flagship_calib.json "
        "— an unbound checkpoint is exactly the round-4 regression; "
        "promote with tools/promote_flagship.py (ckpt + calib together)")


@pytest.fixture(scope="module")
def calib():
    with open(CALIB) as f:
        return json.load(f)


def test_tokenizer_binding_verifies(calib):
    assert calib.get("tokenizer"), "calib lacks the tokenizer binding"
    path = calib["tokenizer"]
    if not os.path.isabs(path):
        path = os.path.join(REPO, path)
    assert os.path.exists(path), f"bound tokenizer missing: {path}"
    with open(path, "rb") as f:
        got = hashlib.sha256(f.read()).hexdigest()
    assert got == calib["tokenizer_sha256"], (
        "bound tokenizer content drifted from the promoted hash")


def test_cli_resolution_uses_the_binding(calib):
    from early_exit_tpu import cli

    path = cli.flagship_bound_tokenizer(CKPT)
    assert path is not None
    want = calib["tokenizer"]
    if not os.path.isabs(want):
        want = os.path.join(REPO, want)
    assert os.path.samefile(path, want)


def test_flagship_decodes_its_own_distribution(calib):
    """One utterance, full committed pipeline: waveform -> frontend ->
    checkpoint forward -> final-exit greedy decode -> BOUND tokenizer.
    The r4 mismatch produced 100% OOV garbage here; the promoted bundle
    decodes near-verbatim. The 50% bound is deliberately loose (single
    hard utterance) — garbage is ~100%."""
    import jax
    import jax.numpy as jnp

    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.data.librispeech import SyntheticDataset
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.ops import ctc, frontend
    from early_exit_tpu.tokenizer.bpe import load_tokenizer
    from early_exit_tpu.training import checkpoint

    knobs = calib.get("bench_eval", {})
    # shortest in-distribution words range, LOW noise (the easy end of
    # the training distribution — this pins decode correctness, not
    # acoustic robustness)
    ds = SyntheticDataset(
        n_items=1, seed=4321, min_words=4, max_words=4,
        noise=knobs.get("noise", 0.02),
        speaker_warp=knobs.get("speaker_warp", 0.0),
        dur_jitter=knobs.get("dur_jitter", 0.0),
        amp_jitter=knobs.get("amp_jitter", 0.0))
    utt = ds[0]

    acfg = AudioConfig()
    cfg = ModelConfig()
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    params, state = checkpoint.load_model_file(CKPT, params, state)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params)

    wav = jnp.asarray(utt.waveform[None, :])
    n = jnp.asarray([len(utt.waveform)])
    feats = frontend.mel_spectrogram(wav, acfg, method="fft")
    lengths = frontend.mel_lengths(n, acfg.hop_length)
    logits, sub_len, _ = early_conformer.apply(
        params, state, feats, lengths, cfg, train=False, log_probs=False)
    toks, ntoks = ctc.greedy_decode(logits[-1], sub_len)

    tok_path = calib["tokenizer"]
    if not os.path.isabs(tok_path):
        tok_path = os.path.join(REPO, tok_path)
    tok = load_tokenizer(tok_path, prefer_native=False)
    hyp = tok.decode([int(t) for t in
                      np.asarray(toks)[0][:int(ntoks[0])]]).lower()
    ref = utt.transcript.lower().split()
    h = hyp.split()
    D = np.zeros((len(ref) + 1, len(h) + 1), np.int32)
    D[:, 0] = np.arange(len(ref) + 1)
    D[0, :] = np.arange(len(h) + 1)
    for a in range(1, len(ref) + 1):
        for b in range(1, len(h) + 1):
            D[a, b] = min(D[a - 1, b] + 1, D[a, b - 1] + 1,
                          D[a - 1, b - 1] + (ref[a - 1] != h[b - 1]))
    wer = D[len(ref), len(h)] / max(len(ref), 1)
    assert wer <= 0.5, (
        f"committed flagship decodes its own distribution at "
        f"{100 * wer:.0f}% WER (ref={' '.join(ref)!r} hyp={hyp!r}) — "
        f"checkpoint<->tokenizer binding is broken")
