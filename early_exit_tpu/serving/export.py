"""AOT export of the recognizer as a self-contained serving artifact.

The reference has no deployment story at all — inference requires the
full Python model zoo plus torch (inference.py:118-185 rebuilds the
model from flags before every eval). The TPU-native analogue of a
TorchScript/ONNX export is ``jax.export``: the jitted end-to-end
program (waveform → log-mel → all-exit encoder → greedy CTC tokens +
per-exit confidence) is lowered to StableHLO once per bucket shape and
serialized, weights baked in as constants. A consumer deserializes and
calls it with NO model code, NO checkpoint, and NO tokenizer build —
just jax and the artifact — and gets bit-identical results on any
machine with the target platform (the StableHLO is
platform-checked at load, and one artifact may carry several
platforms' lowerings).

Bundle format: a plain zip archive —
  manifest.json                per-program shapes + model/audio metadata
  programs/<B>x<S>.bin         serialized jax.export.Exported, one per
                               padded (batch, samples) bucket shape
  programs/poly.bin            optional shape-polymorphic program
                               (symbolic (b, s) dims)
  programs/gated/<key>.bin     optional confidence-gated variants (the
                               while_loop early-exit path, threshold as
                               a runtime scalar)
  vocab.json (optional)        id → piece table so a bare consumer can
                               detokenize greedy output

Program contract, per shape (all leaves static):
  (wav f32 (B, S), n_samples i32 (B,)) ->
      tokens  i32 (E, B, T')   greedy CTC ids per exit, blank-padded
      n_tok   i32 (E, B)       valid token counts
      conf    f32 (E, B)       exit confidence (models/early_exit_gate)
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import AudioConfig, ModelConfig
from early_exit_tpu.models import early_exit_gate
from early_exit_tpu.models.early_exit_gate import exit_confidence
from early_exit_tpu.ops import ctc as ctc_ops
from early_exit_tpu.ops import frontend

_FORMAT = "eet-export-1"


@dataclasses.dataclass
class ExportBundle:
    manifest: dict
    programs: Dict[str, bytes]          # "BxS" -> serialized Exported


def _shape_key(b: int, s: int) -> str:
    return f"{int(b)}x{int(s)}"


def make_serve_fn(model, model_cfg: ModelConfig, audio_cfg: AudioConfig,
                  params, model_state, *, gate_score: str = "maxprob"):
    """The end-to-end program that gets exported: waveform in, per-exit
    greedy tokens + confidence out. Weights are closed over (they become
    constants in the StableHLO)."""

    def serve(wav, n_samples):
        feats = frontend.mel_spectrogram(wav, audio_cfg,
                                         method=audio_cfg.mel_method)
        lengths = frontend.mel_lengths(n_samples, audio_cfg.hop_length)
        logp, sub_len, _ = model.apply(params, model_state, feats,
                                       lengths, model_cfg, train=False)
        E, B, Tp, _ = logp.shape
        mask = jnp.arange(Tp)[None, :] < sub_len[:, None]      # (B, T')

        def one_exit(lp):
            toks, n = ctc_ops.greedy_decode(lp, sub_len,
                                            blank=model_cfg.blank_id)
            conf = exit_confidence(lp, mask, score=gate_score)
            return toks.astype(jnp.int32), n.astype(jnp.int32), conf

        toks, n_tok, conf = jax.vmap(one_exit)(logp)
        return toks, n_tok, conf.astype(jnp.float32)

    return serve


def make_gated_serve_fn(model_cfg: ModelConfig, audio_cfg: AudioConfig,
                        params, model_state, *,
                        gate_score: str = "maxprob"):
    """The work-avoiding variant: the lax.while_loop gate runs the trunk
    exit-by-exit and STOPS once every item clears `threshold` — later
    stacks are genuinely skipped (models/early_exit_gate.py, the ≥2×
    north-star path). threshold stays a runtime scalar argument so a
    deployment can trade latency for quality without re-exporting.

    (wav f32 (B, S), n_samples i32 (B,), threshold f32 ()) ->
        tokens i32 (B, T'), n_tok i32 (B,), chosen_exit i32 (B,)
    """

    def serve(wav, n_samples, threshold):
        feats = frontend.mel_spectrogram(wav, audio_cfg,
                                         method=audio_cfg.mel_method)
        lengths = frontend.mel_lengths(n_samples, audio_cfg.hop_length)
        item_mask = (n_samples > 0).astype(jnp.float32)
        logp, chosen, sub_len, _ = early_exit_gate.gated_apply(
            params, model_state, feats, lengths, model_cfg,
            threshold=threshold, item_mask=item_mask, score=gate_score)
        toks, n_tok = ctc_ops.greedy_decode(logp, sub_len,
                                            blank=model_cfg.blank_id)
        return (toks.astype(jnp.int32), n_tok.astype(jnp.int32),
                chosen.astype(jnp.int32))

    return serve


def make_cascade_fns(model_cfg: ModelConfig, audio_cfg: AudioConfig,
                     params, model_state, *, k: int,
                     gate_score: str = "maxprob",
                     gate_temperatures=None):
    """The two cascade serving programs (serving/cascade.py) in export
    form. Phase-A depth `k` and the calibration temperatures are baked
    (they belong to the promoted operating point); the per-exit
    thresholds stay a runtime (E,) array so a deployment can move along
    the quality/latency curve without re-exporting.

    phase_a: (wav (B, S), n_samples (B,), thresholds (E,)) ->
        (tokens (B, T'), n_tok (B,), chosen (B,), accepted i32 (B,),
         sub_len (B,), h_k (B, T', D))
    phase_b: (h_k (B', T', D), sub_len (B',), thresholds (E,)) ->
        (tokens (B', T'), n_tok (B',), chosen (B',))
    """
    from early_exit_tpu.serving import cascade

    def phase_a(wav, n_samples, thresholds):
        feats = frontend.mel_spectrogram(wav, audio_cfg,
                                         method=audio_cfg.mel_method)
        lengths = frontend.mel_lengths(n_samples, audio_cfg.hop_length)
        item_mask = (n_samples > 0).astype(jnp.float32)
        logp, chosen, accepted, sub_len, h_k = cascade.shallow_apply(
            params, model_state, feats, lengths, model_cfg, k=k,
            threshold=thresholds, score=gate_score,
            temperatures=gate_temperatures, item_mask=item_mask)
        toks, n_tok = ctc_ops.greedy_decode(logp, sub_len,
                                            blank=model_cfg.blank_id)
        return (toks.astype(jnp.int32), n_tok.astype(jnp.int32),
                chosen.astype(jnp.int32), accepted.astype(jnp.int32),
                sub_len.astype(jnp.int32), h_k)

    def phase_b(h_k, sub_len, thresholds):
        logp, chosen = cascade.continue_apply(
            params, model_state, h_k, sub_len, model_cfg, k=k,
            threshold=thresholds, score=gate_score,
            temperatures=gate_temperatures)
        toks, n_tok = ctc_ops.greedy_decode(logp, sub_len,
                                            blank=model_cfg.blank_id)
        return (toks.astype(jnp.int32), n_tok.astype(jnp.int32),
                chosen.astype(jnp.int32))

    return phase_a, phase_b


def export_recognizer(model, model_cfg: ModelConfig,
                      audio_cfg: AudioConfig, params, model_state,
                      shapes: Sequence[Tuple[int, int]] = (), *,
                      platforms: Sequence[str] = ("tpu",),
                      gate_score: str = "maxprob",
                      symbolic_max_samples: int | None = None,
                      gated: bool = False,
                      cascade_k: int | None = None,
                      gate_temperatures=None,
                      tokenizer=None) -> ExportBundle:
    """Lower + serialize the serve program for each (B, S) bucket shape.

    shapes: padded (batch, samples) buckets to compile; a runner pads any
    smaller input up to the closest covering bucket. platforms: lowering
    targets ("tpu", "cpu", "cuda") — all checked at call time by
    jax.export, so one artifact can serve heterogeneous fleets.

    symbolic_max_samples: additionally (or instead) export ONE
    shape-polymorphic program over symbolic (b, s) with
    hop_length*4 <= s <= symbolic_max_samples. The StableHLO carries
    symbolic dims, so the artifact needs no bucket enumeration at export
    time; the consumer still pays one XLA compile per *concrete* shape
    at call time, so a serving fleet should keep padding to a bounded
    shape set. The upper bound exists because greedy CTC compaction
    switches algorithms at T'=1024 (ops/ctc.py) — the comparison must
    resolve at trace time.
    """
    serve = make_serve_fn(model, model_cfg, audio_cfg, params,
                          model_state, gate_score=gate_score)
    jitted = jax.jit(serve)
    gated_jitted = None
    if gated:
        gated_jitted = jax.jit(make_gated_serve_fn(
            model_cfg, audio_cfg, params, model_state,
            gate_score=gate_score))
    casc_a = casc_b = None
    if cascade_k is not None:
        pa, pb = make_cascade_fns(model_cfg, audio_cfg, params,
                                  model_state, k=int(cascade_k),
                                  gate_score=gate_score,
                                  gate_temperatures=gate_temperatures)
        casc_a, casc_b = jax.jit(pa), jax.jit(pb)
    thr_aval = jax.ShapeDtypeStruct((), jnp.float32)
    thrv_aval = jax.ShapeDtypeStruct((model_cfg.n_enc_exits,),
                                     jnp.float32)
    programs: Dict[str, bytes] = {}
    meta_shapes = {}
    n_exits = None
    for b, s in shapes:
        wav_aval = jax.ShapeDtypeStruct((b, s), jnp.float32)
        n_aval = jax.ShapeDtypeStruct((b,), jnp.int32)
        exp = jax.export.export(jitted, platforms=list(platforms))(
            wav_aval, n_aval)
        programs[_shape_key(b, s)] = exp.serialize()
        out = exp.out_avals
        n_exits = int(out[2].shape[0])
        meta_shapes[_shape_key(b, s)] = {
            "wav": [b, s],
            "tokens": list(out[0].shape),
            "n_tok": list(out[1].shape),
            "conf": list(out[2].shape),
        }
        if gated_jitted is not None:
            gexp = jax.export.export(
                gated_jitted, platforms=list(platforms))(
                    wav_aval, n_aval, thr_aval)
            programs["gated/" + _shape_key(b, s)] = gexp.serialize()
        if casc_a is not None:
            aexp = jax.export.export(
                casc_a, platforms=list(platforms))(
                    wav_aval, n_aval, thrv_aval)
            programs["cascade_a/" + _shape_key(b, s)] = aexp.serialize()
            # phase B consumes phase A's h_k/sub_len avals verbatim
            h_aval, sl_aval = aexp.out_avals[5], aexp.out_avals[4]
            bexp = jax.export.export(
                casc_b, platforms=list(platforms))(
                    jax.ShapeDtypeStruct(h_aval.shape, h_aval.dtype),
                    jax.ShapeDtypeStruct(sl_aval.shape, sl_aval.dtype),
                    thrv_aval)
            programs["cascade_b/" + _shape_key(b, s)] = bexp.serialize()
    if symbolic_max_samples is not None:
        # lower bound: the symbolic length arithmetic must PROVE the
        # twice-strided subsampler output length is positive (else the
        # mask path's max(0, .) stays symbolic and shapes mismatch);
        # s >= 10*hop gives >= 1 frame after both conv strides.
        s_min = int(audio_cfg.hop_length) * 10
        b, s = jax.export.symbolic_shape(
            "b, s", constraints=[f"s >= {s_min}",
                                 f"s <= {int(symbolic_max_samples)}",
                                 "b >= 1"])
        wav_aval = jax.ShapeDtypeStruct((b, s), jnp.float32)
        n_aval = jax.ShapeDtypeStruct((b,), jnp.int32)
        exp = jax.export.export(jitted, platforms=list(platforms))(
            wav_aval, n_aval)
        programs["poly"] = exp.serialize()
        n_exits = int(exp.out_avals[2].shape[0])
        meta_shapes["poly"] = {
            "wav": ["b", "s"],
            "min_samples": s_min,
            "max_samples": int(symbolic_max_samples),
        }
        if gated_jitted is not None:
            gexp = jax.export.export(
                gated_jitted, platforms=list(platforms))(
                    wav_aval, n_aval, thr_aval)
            programs["gated/poly"] = gexp.serialize()
    if not programs:
        raise ValueError("export_recognizer: need shapes and/or "
                         "symbolic_max_samples")
    manifest = {
        "format": _FORMAT,
        "platforms": list(platforms),
        "gate_score": gate_score,
        "gated": bool(gated),
        "cascade_k": (int(cascade_k) if cascade_k is not None else None),
        "blank_id": int(model_cfg.blank_id),
        "n_exits": n_exits,
        "sample_rate": int(audio_cfg.sample_rate),
        "hop_length": int(audio_cfg.hop_length),
        "shapes": meta_shapes,
        "model": {
            "d_model": int(model_cfg.d_model),
            "vocab": int(model_cfg.vocab_size),
        },
    }
    vocab = None
    if tokenizer is not None and hasattr(tokenizer, "id_to_piece"):
        vocab = [tokenizer.id_to_piece(i)
                 for i in range(tokenizer.get_piece_size())]
    bundle = ExportBundle(manifest=manifest, programs=programs)
    if vocab is not None:
        bundle.manifest["has_vocab"] = True
        bundle.vocab = vocab                    # type: ignore[attr-defined]
    return bundle


def save_bundle(path: str, bundle: ExportBundle) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("manifest.json", json.dumps(bundle.manifest, indent=1))
        for key, blob in bundle.programs.items():
            z.writestr(f"programs/{key}.bin", blob)
        vocab = getattr(bundle, "vocab", None)
        if vocab is not None:
            z.writestr("vocab.json", json.dumps(vocab))


def load_bundle(path: str) -> ExportBundle:
    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read("manifest.json"))
        if manifest.get("format") != _FORMAT:
            raise ValueError(f"not an eet export bundle: {path}")
        programs = {}
        for name in z.namelist():
            if name.startswith("programs/") and name.endswith(".bin"):
                programs[name[len("programs/"):-4]] = z.read(name)
        bundle = ExportBundle(manifest=manifest, programs=programs)
        if "vocab.json" in z.namelist():
            bundle.vocab = json.loads(z.read("vocab.json"))  # type: ignore
    return bundle


class ExportedRecognizer:
    """Runs a saved bundle with no model code: pads a waveform batch up
    to the closest covering exported shape and calls the deserialized
    program. Deserialization is lazy per shape (first use compiles
    nothing — jax.export artifacts execute directly)."""

    def __init__(self, path: str):
        self.bundle = load_bundle(path)
        self._fns: Dict[str, object] = {}
        self._shapes = sorted(
            (int(k.split("x")[0]), int(k.split("x")[1]))
            for k in self.bundle.programs
            if k != "poly" and "/" not in k)   # gated/ cascade_*/ aside
        self._poly = self.bundle.manifest["shapes"].get("poly") \
            if "poly" in self.bundle.programs else None

    @property
    def manifest(self) -> dict:
        return self.bundle.manifest

    def _pick(self, b: int, s: int) -> Tuple[int, int]:
        """Smallest concrete bucket covering (b, s); falls back to the
        shape-polymorphic program (which XLA compiles per concrete
        shape on first use) when no bucket covers."""
        fits = [(pb, ps) for pb, ps in self._shapes if pb >= b and ps >= s]
        if fits:
            return min(fits, key=lambda t: (t[0] * t[1], t))
        if self._poly is not None and s <= self._poly["max_samples"]:
            return (b, max(s, self._poly["min_samples"]))
        raise ValueError(
            f"no exported shape covers batch={b} samples={s}; "
            f"available: {self._shapes}"
            + (" + poly" if self._poly is not None else ""))

    def _fn(self, key: str):
        if key not in self._fns:
            backend = jax.default_backend()
            allowed = {p.lower() for p in self.manifest["platforms"]}
            # jax.default_backend() and jax.export use different names
            # for the same hardware: axon is the TPU relay backend
            # (StableHLO says "tpu"), and the CUDA/ROCm backends both
            # report "gpu" while export platforms say "cuda"/"rocm" —
            # alias before the membership test or a cuda-exported
            # bundle is wrongly rejected on a GPU host
            aliases = {backend, backend.replace("axon", "tpu")}
            if backend == "gpu":
                aliases |= {"cuda", "rocm"}
            if not (aliases & allowed):
                raise ValueError(
                    f"bundle was exported for {sorted(allowed)} but the "
                    f"current jax backend is '{backend}'; re-export with "
                    f"--export_platforms {backend},... or switch backends "
                    f"(e.g. jax.config.update('jax_platforms', 'cpu'))")
            exp = jax.export.deserialize(self.bundle.programs[key])
            self._fns[key] = exp.call
        return self._fns[key]

    def _padded(self, wav: np.ndarray, n_samples: np.ndarray):
        wav = np.asarray(wav, np.float32)
        n_samples = np.asarray(n_samples, np.int32)
        b, s = wav.shape
        pb, ps = self._pick(b, s)
        if (pb, ps) != (b, s):
            wav = np.pad(wav, ((0, pb - b), (0, ps - s)))
            n_samples = np.pad(n_samples, (0, pb - b))
        key = (_shape_key(pb, ps) if (pb, ps) in self._shapes
               else "poly")
        return key, jnp.asarray(wav), jnp.asarray(n_samples), b

    def __call__(self, wav: np.ndarray, n_samples: np.ndarray):
        """wav (B, S) float32, n_samples (B,) -> (tokens (E, B, T'),
        n_tok (E, B), conf (E, B)) trimmed back to the true batch."""
        key, wav, n_samples, b = self._padded(wav, n_samples)
        toks, n_tok, conf = self._fn(key)(wav, n_samples)
        return (np.asarray(toks)[:, :b], np.asarray(n_tok)[:, :b],
                np.asarray(conf)[:, :b])

    def gated(self, wav: np.ndarray, n_samples: np.ndarray,
              threshold: float):
        """Confidence-gated decode (bundle must be exported with
        gated=True): the program stops at the first exit where every
        item clears `threshold` — later trunk stacks never run. Returns
        (tokens (B, T'), n_tok (B,), chosen_exit (B,) 1-based)."""
        if not self.manifest.get("gated"):
            raise ValueError("bundle was exported without gated=True")
        key, wav, n_samples, b = self._padded(wav, n_samples)
        toks, n_tok, chosen = self._fn("gated/" + key)(
            wav, n_samples, jnp.float32(threshold))
        return (np.asarray(toks)[:b], np.asarray(n_tok)[:b],
                np.asarray(chosen)[:b])

    def cascade(self, wav: np.ndarray, n_samples: np.ndarray,
                thresholds: Sequence[float]):
        """Two-phase re-batched gated decode (bundle must be exported
        with cascade_k): phase A (exits 1..k, fixed cost) on the whole
        batch, then ONLY unaccepted rows — packed on the host, hidden
        states re-fed — continue through exits k+1..E. thresholds: the
        per-exit (E,) operating point (runtime, so deployments can move
        along the quality/latency curve without re-exporting).

        Returns (tokens (B, T'), n_tok (B,), chosen_exit (B,) 1-based,
        escalated (B,) bool)."""
        if self.manifest.get("cascade_k") is None:
            raise ValueError("bundle was exported without cascade_k")
        thr = jnp.asarray(np.asarray(thresholds, np.float32))
        if thr.shape != (self.manifest["n_exits"],):
            raise ValueError(
                f"thresholds must be shape ({self.manifest['n_exits']},)"
                f"; got {tuple(thr.shape)}")
        key, wav, n_samples, b = self._padded(wav, n_samples)
        toks, n_tok, chosen, accepted, sub_len, h_k = self._fn(
            "cascade_a/" + key)(wav, n_samples, thr)
        toks = np.asarray(toks)[:b].copy()
        n_tok = np.asarray(n_tok)[:b].copy()
        chosen = np.asarray(chosen)[:b].copy()
        accepted = np.asarray(accepted)[:b].astype(bool)
        esc = np.nonzero(~accepted)[0]
        if esc.size:
            # pack escalated rows to the front of a full-size phase-B
            # batch (same exported shape); pad rows carry sub_len 0 and
            # are discarded after the call
            B_prog = int(np.asarray(sub_len).shape[0])
            h_np = np.asarray(h_k)
            sl_np = np.asarray(sub_len)
            h_pack = np.zeros_like(h_np)
            sl_pack = np.zeros_like(sl_np)
            h_pack[:esc.size] = h_np[esc]
            sl_pack[:esc.size] = sl_np[esc]
            bt, bn, bc = self._fn("cascade_b/" + key)(
                jnp.asarray(h_pack), jnp.asarray(sl_pack), thr)
            bt, bn, bc = np.asarray(bt), np.asarray(bn), np.asarray(bc)
            for j, i in enumerate(esc):
                toks[i], n_tok[i], chosen[i] = bt[j], bn[j], bc[j]
        return toks, n_tok, chosen, ~accepted

    def detokenize(self, ids: Sequence[int]) -> str:
        """Greedy-output ids -> text via the bundled vocab table (the
        SentencePiece surface-piece concatenation rule)."""
        vocab = getattr(self.bundle, "vocab", None)
        if vocab is None:
            raise ValueError("bundle was exported without a vocab table")
        text = "".join(vocab[int(i)] for i in ids
                       if not (len(vocab[int(i)]) > 2
                               and vocab[int(i)][0] == "<"
                               and vocab[int(i)][-1] == ">"))
        return text.replace("▁", " ").strip()
