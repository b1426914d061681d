"""Host data pipeline: decode → clean → tokenize → bucket → device mel.

The reference runs STFT+mel per item inside DataLoader worker processes on
CPU (util/data_loader.py:200-202). TPU-native split of labor:

- host (this module, with a prefetch thread): audio decode, label
  cleaning/filtering, tokenization, equal-total-frames sub-batch split,
  padding to quantised bucket shapes
- device (jitted): waveform → log-mel for the whole padded sub-batch in
  one call (ops/frontend), feeding the model without re-landing on host

Yields batches shaped for training.trainer.make_train_step:
  {"feats", "feat_lengths", "labels", "label_lengths", "item_mask"}
"""

from __future__ import annotations

import functools
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import AudioConfig, TrainConfig
from early_exit_tpu.data import bucketing, text as text_mod
from early_exit_tpu.ops import frontend


@functools.lru_cache(maxsize=4)
def _jit_mel(n_fft: int, win: int, hop: int, n_mels: int, sr: int,
             method: str):
    acfg = AudioConfig(sample_rate=sr, n_fft=n_fft, win_length=win,
                       hop_length=hop, n_mels=n_mels)

    @jax.jit
    def f(wav_i16):
        # int16 wire format: halves host->device bytes (the transfer is
        # the pipeline bottleneck over the axon relay); lossless for
        # 16-bit sources (FLAC), -96 dB quantisation noise otherwise
        wav = wav_i16.astype(jnp.float32) * (1.0 / 32768.0)
        return frontend.mel_spectrogram(wav, acfg, method=method)
    return f


class Pipeline:
    def __init__(self, dataset, tokenizer, audio_cfg: AudioConfig,
                 train_cfg: TrainConfig, *, bpe: bool = True,
                 shuffle: bool = True, seed: int = 0,
                 infer_mode: bool = False, prefetch: int = 4,
                 frame_bucket: int = 100, label_bucket: int = 16,
                 workers: int = 4):
        self.ds = dataset
        self.tok = tokenizer
        self.acfg = audio_cfg
        self.tcfg = train_cfg
        self.bpe = bpe
        self.shuffle = shuffle
        self.seed = seed
        self.infer_mode = infer_mode
        self.prefetch = prefetch
        self.frame_bucket = frame_bucket
        self.label_bucket = label_bucket
        # audio decode happens in native code (ctypes releases the GIL),
        # so a thread pool scales like the reference's worker processes
        # (data.py:27 num_workers)
        self.workers = max(workers, 1)
        self._clip_warned = False
        self._mel = _jit_mel(audio_cfg.n_fft, audio_cfg.win_length,
                             audio_cfg.hop_length, audio_cfg.n_mels,
                             audio_cfg.sample_rate, audio_cfg.mel_method)

    # -- per-epoch iteration ------------------------------------------------
    def batches_per_epoch(self) -> int:
        return max(len(self.ds) // self.tcfg.batch_size, 1)

    def _load_item(self, i: int):
        utt = self.ds[i]
        if self.infer_mode:
            label = text_mod.clean_infer_label(utt.transcript)
            if label is None:
                return None
        else:
            label = text_mod.clean_train_label(utt.transcript)
            if len(label) >= self.tcfg.max_utterance_length:
                return None
        ids = text_mod.encode_target(label, self.tok, bpe=self.bpe)
        return utt.waveform, ids, label

    def _make_subbatch(self, items):
        """items: list of (waveform, ids, label) -> device batch dict."""
        n = len(items)
        nb = bucketing.bucket_batch_size(n)
        max_samples = max(len(w) for w, _, _ in items)
        # quantise frames, then derive the sample count that yields them
        frames = 1 + max_samples // self.acfg.hop_length
        frames_b = bucketing.bucket_frames(frames, self.frame_bucket)
        samples_b = (frames_b - 1) * self.acfg.hop_length
        max_l = max(len(ids) for _, ids, _ in items)
        l_b = bucketing.bucket_labels(max_l, self.label_bucket)

        wav = np.zeros((nb, samples_b), np.int16)
        labels = np.full((nb, l_b), self.tok.pad_id(), np.int32)
        n_samples = np.zeros((nb,), np.int32)
        label_len = np.zeros((nb,), np.int32)
        for j, (w, ids, _) in enumerate(items):
            w = w[:samples_b]
            scaled = np.asarray(w, np.float32) * 32768.0
            if not self._clip_warned and (scaled.size and
                                          (scaled.max() > 32767.0 or
                                           scaled.min() < -32768.0)):
                # the int16 wire format is lossless for 16-bit sources;
                # non-normalized float audio outside [-1, 1) clips here
                print("warning: waveform samples outside [-1, 1) clipped "
                      "by the int16 wire format (normalize the source "
                      "audio); further clips are silent")
                self._clip_warned = True
            wav[j, :len(w)] = np.clip(scaled, -32768, 32767
                                      ).astype(np.int16)
            n_samples[j] = len(w)
            ids = ids[:l_b]
            labels[j, :len(ids)] = ids
            label_len[j] = len(ids)
        item_mask = (np.arange(nb) < n).astype(np.float32)

        feats = self._mel(jnp.asarray(wav))
        # lengths are pure integer arithmetic — keep on host (numpy) and
        # transfer the result rather than paying an eager-op dispatch
        feat_lengths = jnp.asarray(
            frontend.mel_lengths(n_samples, self.acfg.hop_length))
        return {
            "feats": feats,
            "feat_lengths": feat_lengths,
            "labels": jnp.asarray(labels),
            "label_lengths": jnp.asarray(label_len),
            "item_mask": jnp.asarray(item_mask),
        }

    def _epoch_host(self, epoch: int) -> Iterator[List]:
        """Yields lists of n_batch_split sub-batches (host objects)."""
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        bs = self.tcfg.batch_size
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(self.workers) if self.workers > 1 else None
        try:
            # the trailing partial batch is kept (the reference DataLoader
            # defaults to drop_last=False); static bucket shapes absorb it
            for start in range(0, len(idx), bs):
                ids = [int(i) for i in idx[start:start + bs]]
                if pool is not None:
                    items = list(pool.map(self._load_item, ids))
                else:
                    items = [self._load_item(i) for i in ids]
                chunk = [it for it in items if it is not None]
                if not chunk:
                    continue
                sizes = [len(w) for w, _, _ in chunk]
                splits = bucketing.split_equal_total(
                    chunk, sizes, self.tcfg.n_batch_split)
                yield [s for s in splits if s]
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yields device-ready sub-batches, prefetched in order.

        Sub-batch builds (pad + host→device transfer + jitted mel
        dispatch) overlap across a bounded window of futures: under the
        axon relay a single transfer costs a ~26 ms round-trip, and one
        serial producer thread made the trainer transfer-bound (~5× the
        device time per epoch). In-order completion keeps batch order
        deterministic, and a failed build re-raises here instead of
        dying silently in a daemon thread."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = max(self.prefetch, 2)
        with ThreadPoolExecutor(min(window, 4)) as pool:
            pending: deque = deque()
            for splits in self._epoch_host(epoch):
                for s in splits:
                    pending.append(pool.submit(self._make_subbatch, s))
                    while len(pending) >= window:
                        yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
