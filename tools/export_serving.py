#!/usr/bin/env python
"""Export a trained recognizer as a self-contained AOT serving artifact.

    python tools/export_serving.py --decoder_mode ctc \
        --load_model_path ckpt/mod042-transformer \
        --export_path model.eetx \
        --export_shapes 8x160000,32x160000 \
        --export_platforms tpu,cpu

The artifact (serving/export.py bundle) embeds the weights as StableHLO
constants plus the vocab table; a consumer runs it with jax alone:

    from early_exit_tpu.serving.export import ExportedRecognizer
    rec = ExportedRecognizer("model.eetx")
    tokens, n_tok, conf = rec(wav, n_samples)
    text = rec.detokenize(tokens[-1][0][:n_tok[-1][0]])

The reference has no deployment story (inference requires the whole
torch model zoo, inference.py:118-185); this is the TPU-native
TorchScript/ONNX analogue.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

if os.environ.get("EET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from early_exit_tpu.cli import get_args                      # noqa: E402
from early_exit_tpu.models.registry import build_model       # noqa: E402
from early_exit_tpu.serving import export as exp             # noqa: E402
from early_exit_tpu.training import checkpoint               # noqa: E402


def _parse_shapes(spec: str):
    shapes = []
    for part in spec.split(","):
        b, s = part.lower().split("x")
        shapes.append((int(b), int(s)))
    return shapes


def main(argv=None):
    own = argparse.ArgumentParser(add_help=False)
    own.add_argument("--export_path", required=True)
    own.add_argument("--export_shapes", default="8x160000",
                     help="comma-separated BxS padded (batch, samples) "
                          "buckets, e.g. 8x160000,32x160000")
    own.add_argument("--export_platforms", default=None,
                     help="comma-separated lowering targets (tpu,cpu,"
                          "cuda); default: the current jax backend")
    own.add_argument("--export_symbolic_max", type=int, default=None,
                     help="also export ONE shape-polymorphic program "
                          "valid up to this many samples (consumer "
                          "compiles per concrete shape at call time)")
    own.add_argument("--export_gated", default="false",
                     help="true: also export confidence-gated variants "
                          "(while_loop early exit, threshold a runtime "
                          "scalar) — rec.gated(wav, n, threshold)")
    own.add_argument("--export_cascade_k", type=int, default=None,
                     help="also export the two-phase cascade programs "
                          "(serving/cascade.py) at this phase-A depth — "
                          "rec.cascade(wav, n, thresholds). Per-exit "
                          "thresholds stay runtime; --gate_calibration "
                          "(if given) bakes its temperatures in")
    mine, rest = own.parse_known_args(argv)

    args, model_cfg, _, audio_cfg, tokenizer = get_args(rest, mode="infer")
    if args.decoder_mode != "ctc":
        sys.exit("export: the AOT serving program is the CTC greedy "
                 "path; AED beam search is a host-driven loop")
    model = build_model(model_cfg)
    params, model_state = model.init(jax.random.PRNGKey(args.seed),
                                     model_cfg)
    if args.load_model_path is not None:
        params, model_state = checkpoint.load_model_file(
            args.load_model_path, params, model_state)
    elif None not in (args.load_model_dir, args.avg_model_start,
                      args.avg_model_end):
        params, model_state = checkpoint.avg_models(
            args.load_model_dir, args.avg_model_start, args.avg_model_end,
            params, model_state)
    else:
        sys.exit("export: need --load_model_path or --load_model_dir "
                 "with --avg_model_start/--avg_model_end")

    platforms = (mine.export_platforms.split(",")
                 if mine.export_platforms
                 else [jax.default_backend()])
    shapes = _parse_shapes(mine.export_shapes) if mine.export_shapes \
        else []
    gate = args.gate_score
    temps = None
    if args.gate_calibration is not None:
        import json
        with open(args.gate_calibration) as f:
            calib = json.load(f)
        gate = calib.get("score", gate)
        temps = calib.get("temperatures")
    bundle = exp.export_recognizer(
        model, model_cfg, audio_cfg, params, model_state, shapes,
        platforms=platforms, gate_score=gate,
        symbolic_max_samples=mine.export_symbolic_max,
        gated=mine.export_gated.lower() in ("true", "1", "yes"),
        cascade_k=mine.export_cascade_k,
        gate_temperatures=temps,
        tokenizer=tokenizer)
    exp.save_bundle(mine.export_path, bundle)
    size = os.path.getsize(mine.export_path)
    n_prog = len(bundle.programs)
    print(f"exported {n_prog} program(s) x {platforms} "
          f"-> {mine.export_path} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
