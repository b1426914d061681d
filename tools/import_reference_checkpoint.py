#!/usr/bin/env python
"""Convert a reference (torch) checkpoint into this framework's format.

A user of augustgw/early-exit-transformer brings their trained
``mod{epoch}-transformer`` (a torch ``state_dict``, reference
train.py:125) and gets a checkpoint loadable by our inference.py /
train.py — same architecture flags as the reference CLI:

    python tools/import_reference_checkpoint.py \
        --torch_ckpt /path/to/mod016-transformer --out imported-ckpt \
        --decoder_mode ctc --model_type early_conformer \
        [--d_model 256 --n_enc_exits 6 ... reference flags]

The mapped tree is validated leaf-by-leaf (structure + shapes) against
the target model's init template before saving, and a forward pass is
run on dummy audio as a smoke check. Supported model types:
early_conformer, splitformer, early_zipformer, and (via
--decoder_mode aed) the AED full_conformer (see early_exit_tpu/
interop.py for the exact tensor mapping).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EET_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    tool_args, rest = ap.parse_known_args(argv)

    import jax
    import torch

    from early_exit_tpu import interop
    from early_exit_tpu.cli import get_args
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.training import checkpoint

    args, model_cfg, train_cfg, audio_cfg, tokenizer = get_args(
        rest, mode="infer")

    sd = torch.load(tool_args.torch_ckpt, map_location="cpu")
    if not isinstance(sd, dict):
        sys.exit("--torch_ckpt must hold a state_dict (the reference "
                 "saves model.state_dict(), train.py:125)")
    sd = {k: v.numpy() for k, v in sd.items()}
    params, state = interop.from_reference_state_dict(sd, model_cfg)

    # validate against the real init template: identical structure, shapes
    model = build_model(model_cfg)
    t_params, t_state = model.init(jax.random.PRNGKey(0), model_cfg)
    for name, got, want in (("params", params, t_params),
                            ("model_state", state, t_state)):
        gl, gt = jax.tree_util.tree_flatten(got)
        wl, wt = jax.tree_util.tree_flatten(want)
        if gt != wt:
            sys.exit(f"{name}: mapped tree structure != model template\n"
                     f"  mapped:   {gt}\n  template: {wt}")
        for g, w in zip(gl, wl):
            if np.shape(g) != np.shape(w):
                sys.exit(f"{name}: leaf shape {np.shape(g)} != template "
                         f"{np.shape(w)}")

    # smoke: one forward on dummy audio-shaped features
    feats = np.zeros((1, 63, model_cfg.n_mels), np.float32)
    if model_cfg.model_type == "full_conformer":
        trg = np.asarray([[model_cfg.bos_id, model_cfg.eos_id]])
        dec, out, sub_len, _ = model.apply(params, state, feats,
                                           np.asarray([63]), trg,
                                           model_cfg, train=False)
        print(f"forward ok: enc {tuple(out.shape)} dec {tuple(dec.shape)}")
    else:
        out, sub_len, _ = model.apply(params, state, feats,
                                      np.asarray([63]), model_cfg,
                                      train=False)
        print(f"forward ok: exits x (B, T', V) = {tuple(out.shape)}")

    checkpoint.save_pytree({"params": params, "model_state": state},
                           tool_args.out)
    n = sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(params))
    print(f"imported {len(sd)} reference tensors -> {tool_args.out} "
          f"({n:,} parameters); load with --load_model_path")


if __name__ == "__main__":
    main()
