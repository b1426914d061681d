#!/usr/bin/env python
"""Real multi-process (DCN-style) validation of the distributed trainer.

The virtual 8-device CPU mesh used by the test suite exercises GSPMD
sharding semantics but keeps every device in one process. This tool runs
the REAL multi-process path — `jax.distributed.initialize`, per-process
local data feeding via `jax.make_array_from_process_local_data`, and
cross-process collectives (Gloo on CPU; the same program rides ICI/DCN
on real TPU slices, SURVEY.md §2.3):

  parent        spawns N=2 worker processes, each with 4 local virtual
                CPU devices → one 8-device global (replica, data, model)
                = (2, 2, 2) mesh whose outermost axis crosses processes,
                exactly like slices across DCN (parallel/mesh.py:make_mesh)
  workers       run 2 full train steps of the flagship early_conformer
                (CTC loss fwd+bwd + Noam-AdamW) over the global mesh,
                each process feeding only its local half of the batch
  parent        re-runs the same 2 steps single-process/unsharded and
                requires the distributed losses to match (GSPMD semantics
                preservation: sharding must not change the math)

Usage:  python tools/multiprocess_smoke.py            # parent
        (workers are spawned with --child <pid> --port <p>)
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_PROCS = 2
LOCAL_DEVICES = 4
GLOBAL_BATCH = 8
STEPS = 2
SEED = 0


def _tiny_args():
    """Tiny flagship config: fast to compile, real code path."""
    return ["--decoder_mode", "ctc", "--synthetic_data", "true",
            "--d_model", "32", "--n_enc_exits", "2",
            "--n_enc_layers_per_exit", "1", "--n_heads", "4",
            "--d_feed_forward", "64", "--depthwise_kernel_size", "7",
            "--batch_size", str(GLOBAL_BATCH), "--n_batch_split", "1"]


def _setup(n_local: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


def _build(jax):
    """Model/optimizer/batch — identical on every process (same seeds)."""
    import jax.numpy as jnp

    from early_exit_tpu.cli import get_args
    from early_exit_tpu.data.librispeech import SyntheticDataset
    from early_exit_tpu.data.pipeline import Pipeline
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.optim import make_optimizer
    from early_exit_tpu.training import trainer

    args, model_cfg, train_cfg, audio_cfg, tok = get_args(_tiny_args())
    model = build_model(model_cfg)
    params, model_state = model.init(jax.random.PRNGKey(SEED), model_cfg)
    ds = SyntheticDataset(n_items=GLOBAL_BATCH, seed=SEED)
    pipe = Pipeline(ds, tok, audio_cfg, train_cfg, bpe=args.bpe,
                    shuffle=False, seed=SEED, workers=1)
    batch = next(pipe.epoch(0))
    batch = {k: __import__("numpy").asarray(v) for k, v in batch.items()}
    opt = make_optimizer(args.d_model, warmup=100)
    state = {"params": params, "model_state": model_state,
             "opt_state": opt.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step_fn = trainer.make_train_step(model, model_cfg, train_cfg, opt)
    return state, batch, step_fn


def run_child(pid: int, port: int) -> None:
    jax = _setup(LOCAL_DEVICES)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROCS, process_id=pid)
    assert len(jax.local_devices()) == LOCAL_DEVICES
    assert len(jax.devices()) == N_PROCS * LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from early_exit_tpu.parallel import make_mesh
    from early_exit_tpu.parallel.mesh import batch_axes, param_pspec

    # (replica, data, model) = (2, 2, 2): replica crosses the process
    # boundary (jax.devices() orders by process), like slices across DCN
    mesh = make_mesh(dp=2, tp=2, dcn=N_PROCS)
    assert mesh.devices.shape == (N_PROCS, 2, 2)

    state, batch, step_fn = _build(jax)

    def to_global(tree, pspec_fn):
        def place(path, leaf):
            leaf = np.asarray(leaf)
            sh = NamedSharding(mesh, pspec_fn(path, leaf))
            return jax.make_array_from_process_local_data(sh, leaf)
        return jax.tree_util.tree_map_with_path(place, tree)

    # params: tensor-sharded per the production rules; opt/model state
    # replicated; every process passes the full array and
    # make_array_from_process_local_data slices its local shards
    state = {
        "params": to_global(state["params"], param_pspec),
        "model_state": to_global(state["model_state"], lambda *_: P()),
        "opt_state": to_global(state["opt_state"], lambda *_: P()),
        "step": to_global(state["step"], lambda *_: P()),
    }
    # batch: THIS process feeds only its local rows (the real multi-host
    # data-loading contract — no process ever holds the global batch)
    baxes = batch_axes(mesh)
    per_proc = GLOBAL_BATCH // N_PROCS
    lo, hi = pid * per_proc, (pid + 1) * per_proc

    def place_batch(leaf):
        sh = NamedSharding(mesh, P(baxes, *([None] * (leaf.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, leaf[lo:hi])

    gbatch = jax.tree_util.tree_map(place_batch, batch)

    jstep = jax.jit(step_fn)
    rng = jax.random.PRNGKey(SEED + 1)
    for s in range(STEPS):
        state, metrics = jstep(state, gbatch, rng)
        # loss is fully replicated -> addressable on every process
        print(f"MP_LOSS step={s} pid={pid} {float(metrics['loss']):.6f}",
              flush=True)


def run_parent() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--child", str(i), "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=REPO)
        for i in range(N_PROCS)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out[-4000:])
            print(f"FAIL: worker {i} rc={p.returncode}")
            return 1

    losses = {}          # step -> {pid: loss}
    for out in outs:
        for m in re.finditer(r"MP_LOSS step=(\d+) pid=(\d+) ([\d.]+)", out):
            losses.setdefault(int(m.group(1)), {})[int(m.group(2))] = \
                float(m.group(3))
    assert len(losses) == STEPS, f"missing steps: {losses}"
    for s, by_pid in losses.items():
        assert len(by_pid) == N_PROCS
        vals = list(by_pid.values())
        assert max(vals) - min(vals) < 1e-5, \
            f"processes disagree at step {s}: {by_pid}"

    # single-process unsharded oracle: identical math expected
    jax = _setup(1)
    state, batch, step_fn = _build(jax)
    import jax.numpy as jnp
    jstep = jax.jit(step_fn)
    rng = jax.random.PRNGKey(SEED + 1)
    ok = True
    for s in range(STEPS):
        state, metrics = jstep(
            state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
        ref = float(metrics["loss"])
        got = losses[s][0]
        line = (f"step {s}: distributed={got:.6f} single={ref:.6f} "
                f"|Δ|={abs(got - ref):.2e}")
        print(line)
        if abs(got - ref) > 5e-3 * max(1.0, abs(ref)):
            print(f"FAIL: {line}")
            ok = False
    if ok:
        print(f"multiprocess_smoke ok: {N_PROCS} processes x "
              f"{LOCAL_DEVICES} devices, mesh=(replica=2, data=2, model=2), "
              f"{STEPS} steps loss-equal to single-process")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    a = ap.parse_args()
    if a.child is not None:
        run_child(a.child, a.port)
        return 0
    return run_parent()


if __name__ == "__main__":
    sys.exit(main())
