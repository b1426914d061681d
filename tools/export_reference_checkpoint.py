#!/usr/bin/env python
"""Convert one of our checkpoints into the reference's torch format.

The inverse of tools/import_reference_checkpoint.py: models trained
here export to a ``state_dict`` the reference repo (or any torch
tooling) loads with ``strict=True`` — including positional-encoding
buffers and BatchNorm running stats:

    python tools/export_reference_checkpoint.py \
        --ckpt trained_model/mod016-transformer --out mod016-torch \
        --decoder_mode ctc --model_type early_conformer [arch flags]
    # then, in the reference repo:
    #   model.load_state_dict(torch.load("mod016-torch"))

Supports the whole zoo: early_conformer, splitformer, early_zipformer,
and (--decoder_mode aed) full_conformer. Round-trip exactness is pinned
by tests/test_torch_import.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EET_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--ckpt", required=True,
                    help="our checkpoint (msgpack, e.g. modNNN-transformer)")
    ap.add_argument("--out", required=True)
    tool_args, rest = ap.parse_known_args(argv)

    import jax
    import torch

    from early_exit_tpu import interop
    from early_exit_tpu.cli import get_args
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.training import checkpoint

    args, model_cfg, _, _, _ = get_args(rest, mode="infer")
    model = build_model(model_cfg)
    params, state = model.init(jax.random.PRNGKey(0), model_cfg)
    params, state = checkpoint.load_model_file(tool_args.ckpt, params,
                                               state)
    sd = interop.to_reference_state_dict(params, state, model_cfg)
    torch.save({k: torch.from_numpy(v.copy()) if v.ndim else
                torch.tensor(v) for k, v in sd.items()}, tool_args.out)
    print(f"exported {len(sd)} tensors -> {tool_args.out} "
          f"(torch state_dict, strict-loadable by the reference "
          f"{model_cfg.model_type})")


if __name__ == "__main__":
    main()
