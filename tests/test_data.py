import numpy as np
import pytest

from early_exit_tpu.configs import AudioConfig, TrainConfig
from early_exit_tpu.data import bucketing, librispeech, pipeline, text
from early_exit_tpu.tokenizer import CharTokenizer


def test_clean_train_label():
    assert text.clean_train_label("HELLO <unk> WORLD!") == "HELLO  WORLD"
    assert text.clean_train_label("A [ unclear ] B") == "A  B"
    assert text.clean_train_label("KEEP, COMMA") == "KEEP, COMMA"
    assert text.clean_train_label("X#^$?:;.![]Y") == "XY"


def test_clean_infer_label():
    assert text.clean_infer_label("A, B.") == "A B"
    assert text.clean_infer_label("x ignore_time_segment_in_scoring") is None


def test_encode_target_char():
    tok = CharTokenizer()
    ids = text.encode_target("AB", tok, bpe=False)
    assert ids[0] == 1 and ids[-1] == 31    # ^ ... $
    assert ids[1:3] == [2, 3]               # a, b


def test_split_equal_total():
    sizes = [100, 90, 50, 40, 30, 20, 10, 10]
    items = list(range(8))
    chunks = bucketing.split_equal_total(items, sizes, 4)
    assert sum(len(c) for c in chunks) == 8
    # sorted desc: first chunk gets the longest items
    assert chunks[0][0] == 0
    totals = [sum(sizes[i] for i in c) for c in chunks]
    assert max(totals) <= 2.5 * min(totals)


def test_bucket_quantisation():
    assert bucketing.bucket_batch_size(5) == 8
    assert bucketing.bucket_batch_size(64) == 64
    assert bucketing.bucket_frames(101) == 200
    assert bucketing.bucket_frames(100) == 100
    assert bucketing.bucket_labels(17) == 32


def test_synthetic_dataset_deterministic():
    ds = librispeech.SyntheticDataset(n_items=4, seed=3)
    a = ds[2]
    b = ds[2]
    np.testing.assert_array_equal(a.waveform, b.waveform)
    assert a.transcript == b.transcript
    assert a.sample_rate == 16000
    assert len(a.waveform) > 1000


def test_synthetic_hard_mode_knobs():
    """Hard-mode knobs (speaker warp / duration / amplitude jitter) keep
    the transcript and determinism; zeroed knobs are bit-identical to the
    default constructor (the easy corpus used everywhere else)."""
    easy = librispeech.SyntheticDataset(n_items=4, seed=3)
    zeroed = librispeech.SyntheticDataset(
        n_items=4, seed=3, speaker_warp=0.0, dur_jitter=0.0,
        amp_jitter=0.0)
    hard = librispeech.SyntheticDataset(
        n_items=4, seed=3, speaker_warp=0.1, dur_jitter=0.2,
        amp_jitter=0.3, noise=0.06)
    for i in range(4):
        np.testing.assert_array_equal(easy[i].waveform, zeroed[i].waveform)
        # same seed/index -> same words, different audio realisation
        assert hard[i].transcript == easy[i].transcript
        assert (len(hard[i].waveform) != len(easy[i].waveform)
                or not np.array_equal(hard[i].waveform, easy[i].waveform))
        np.testing.assert_array_equal(hard[i].waveform, hard[i].waveform)
    # deterministic across instances
    hard2 = librispeech.SyntheticDataset(
        n_items=4, seed=3, speaker_warp=0.1, dur_jitter=0.2,
        amp_jitter=0.3, noise=0.06)
    np.testing.assert_array_equal(hard[1].waveform, hard2[1].waveform)


def test_pipeline_yields_model_ready_batches():
    ds = librispeech.SyntheticDataset(n_items=16, seed=0)
    tok = CharTokenizer()
    acfg = AudioConfig()
    tcfg = TrainConfig(batch_size=8, n_batch_split=2)
    pipe = pipeline.Pipeline(ds, tok, acfg, tcfg, bpe=False, shuffle=True)
    batches = list(pipe.epoch(0))
    assert len(batches) >= 2
    for b in batches:
        B, T, F = b["feats"].shape
        assert F == acfg.n_mels
        assert b["labels"].shape[0] == B
        assert b["feat_lengths"].shape == (B,)
        assert float(b["item_mask"].sum()) <= B
        # valid rows have sensible lengths
        fl = np.asarray(b["feat_lengths"])
        im = np.asarray(b["item_mask"]).astype(bool)
        assert (fl[im] > 0).all()
        assert (fl[im] <= T).all()
        lb = np.asarray(b["labels"])
        ll = np.asarray(b["label_lengths"])
        assert (ll[im] >= 2).all()
        # targets start with SOS on valid rows
        assert (lb[im, 0] == 1).all()


def test_pipeline_trains_end_to_end():
    """Minimum end-to-end slice (SURVEY.md §7.3): tiny model on synthetic
    audio via the full pipeline; loss decreases."""
    import jax
    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.optim import make_optimizer
    from early_exit_tpu.training import trainer

    ds = librispeech.SyntheticDataset(n_items=8, seed=1, min_words=2,
                                      max_words=4)
    tok = CharTokenizer()
    acfg = AudioConfig()
    tcfg = TrainConfig(batch_size=8, n_batch_split=1)
    cfg = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                      n_enc_exits=2, n_enc_layers_per_exit=1,
                      depthwise_kernel_size=7, vocab_size=32, n_mels=80,
                      compute_dtype="float32", drop_prob=0.0,
                      pad_id=30, bos_id=1, eos_id=31)
    pipe = pipeline.Pipeline(ds, tok, acfg, tcfg, bpe=False, shuffle=False)
    opt = make_optimizer(cfg.d_model, warmup=20)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg, opt))
    rng = jax.random.PRNGKey(1)
    first = last = None
    for epoch in range(6):
        for batch in pipe.epoch(0):   # same data each pass (overfit)
            state, m = step(state, batch, rng)
            loss = float(m["loss"])
            if first is None:
                first = loss
            last = loss
    assert np.isfinite(last)
    assert last < first


def test_pipeline_int16_wire_is_lossless_for_16bit_sources():
    """The pipeline ships waveforms as int16 (pipeline._make_subbatch) and
    rescales on device. For a waveform already quantised to 16-bit levels
    (every real FLAC source), the mel features must match the fp32 path
    bit-for-bit-close; for arbitrary floats the error stays at the -96 dB
    quantisation floor."""
    import jax.numpy as jnp

    from early_exit_tpu.ops import frontend

    ds = librispeech.SyntheticDataset(n_items=4, seed=1)
    tok = CharTokenizer()
    acfg = AudioConfig()
    tcfg = TrainConfig(batch_size=4, n_batch_split=1)
    pipe = pipeline.Pipeline(ds, tok, acfg, tcfg, bpe=False, shuffle=False)

    items = [pipe._load_item(i) for i in range(4)]
    # quantise the sources to 16-bit levels, as FLAC decode would yield
    items = [(np.round(np.clip(w, -1, 1) * 32768.0).clip(-32768, 32767)
              / 32768.0, ids, lab) for w, ids, lab in items]
    batch = pipe._make_subbatch(items)

    # fp32 oracle: pad identically, run the same mel
    samples_b = batch["feats"].shape[1]  # frames
    samples_b = (samples_b - 1) * acfg.hop_length
    wav = np.zeros((len(items), samples_b), np.float32)
    for j, (w, _, _) in enumerate(items):
        w = w[:samples_b]
        wav[j, : len(w)] = w
    ref = frontend.mel_spectrogram(jnp.asarray(wav), acfg)

    got = np.asarray(batch["feats"], np.float32)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_make_corpus_multi_speaker_split(tmp_path):
    """One split written in two make_corpus calls (the dev-mixed recipe,
    tools/calibrate_shift_demo.py) must use distinct speaker ids so file
    stems cannot collide — a collision silently appends mismatched
    transcripts."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.reference_scale_run import make_corpus
    from early_exit_tpu.data.librispeech import LibriSpeechDataset

    root = str(tmp_path)
    make_corpus(root, "dev-mixed", 6, seed=11, min_words=2, max_words=4,
                speaker="1001")
    make_corpus(root, "dev-mixed", 6, seed=22, min_words=2, max_words=4,
                speaker="2002", noise=0.18, speaker_warp=0.1)
    ds = LibriSpeechDataset(root, "dev-mixed")
    assert len(ds) == 12
    transcripts = {ds[i].transcript for i in range(12)}
    assert len(transcripts) == 12          # no duplicate/overwritten rows
    assert all(ds[i].waveform.size > 0 for i in range(12))


def test_multi_split_concat(tmp_path):
    """Comma-separated --train_split concatenates splits (the reference's
    full-960h ConcatDataset recipe, data.py:9-16)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import pytest
    from tools.reference_scale_run import make_corpus
    from early_exit_tpu.data.librispeech import LibriSpeechDataset

    root = str(tmp_path)
    make_corpus(root, "train-clean-100", 4, seed=1, min_words=2,
                max_words=3, speaker="1001")
    make_corpus(root, "train-clean-360", 3, seed=2, min_words=2,
                max_words=3, speaker="2002")
    ds = LibriSpeechDataset(root, "train-clean-100,train-clean-360")
    assert len(ds) == 7
    # split order preserved: the first split's items come first
    solo = LibriSpeechDataset(root, "train-clean-100")
    assert [it[0] for it in ds.items[:4]] == [it[0] for it in solo.items]
    assert all(ds[i].waveform.size > 0 for i in range(7))
    with pytest.raises(FileNotFoundError):
        LibriSpeechDataset(root, "train-clean-100,train-other-500")
    with pytest.raises(ValueError):
        LibriSpeechDataset(root, " , ")
