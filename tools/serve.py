#!/usr/bin/env python
"""Streaming ASR server: TCP, one connection per audio stream.

Production-serving front for early_exit_tpu.serving: each connection
streams raw PCM and receives transcripts incrementally. All connections
share one compiled window program (and, with --exit_threshold, the
gated fast/deep pair); per-connection state is a StreamingRecognizer.

Protocol (newline-delimited JSON + raw audio):
  client -> server: one JSON header line
        {"sample_rate": 16000, "format": "s16le"}
    then raw little-endian int16 PCM until the client half-closes the
    write side (shutdown(SHUT_WR)).
  server -> client: JSON lines
        {"partial": "<newly emitted text>"}     as chunks decode
        {"final": "<full transcript>", "ids": [...], "exits_run": [...]}
    then the server closes.

Usage:
  EET_PLATFORM=cpu python tools/serve.py --port 7070 \
      --load_model_path model/mod039-transformer [model dims...] \
      [--chunk_s 1.0 --left_s 3.0 --right_s 0.5 --exit_threshold 0.9]

Smoke client:
  python tools/serve.py --selftest   # spawns a server + one client
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import sys
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get("EET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EET_PLATFORM"])

import numpy as np  # noqa: E402


def _pop_extra(argv):
    extra = {"--port": 7070, "--chunk_s": 1.0, "--left_s": 3.0,
             "--right_s": 0.5, "--causal_attention": 0.0,
             "--n_exit": None}
    for k in list(extra):
        if k in argv:
            i = argv.index(k)
            extra[k] = float(argv[i + 1])
            del argv[i:i + 2]
    return extra


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def make_server(argv, port_holder=None):
    from early_exit_tpu.cli import get_args
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.serving import StreamingRecognizer
    from early_exit_tpu.training import checkpoint

    argv = list(argv)
    extra = _pop_extra(argv)
    if "--decoder_mode" not in argv:
        argv = ["--decoder_mode", "ctc"] + argv
    args, mcfg, tcfg, acfg, tok = get_args(argv)
    model = build_model(mcfg)
    params, mstate = model.init(jax.random.PRNGKey(args.seed), mcfg)
    if args.load_model_path:
        params, mstate = checkpoint.load_model_file(
            args.load_model_path, params, mstate)

    from early_exit_tpu.serving.streaming import _slice_weights

    rec_kw = dict(chunk_s=extra["--chunk_s"], left_s=extra["--left_s"],
                  right_s=extra["--right_s"],
                  causal_attention=bool(extra["--causal_attention"]),
                  n_exit=int(extra["--n_exit"]) if extra["--n_exit"]
                  else None)
    if args.exit_threshold is not None:
        rec_kw["exit_threshold"] = float(args.exit_threshold)
    # one device copy of the sliced trunk/head shared by EVERY connection
    n_exit = rec_kw["n_exit"] or mcfg.n_enc_exits
    rec_kw["_shared_weights"] = _slice_weights(params, mstate, mcfg, n_exit)
    if rec_kw.get("exit_threshold") is not None and n_exit > 1:
        rec_kw["_shared_fast_weights"] = _slice_weights(params, mstate,
                                                        mcfg, 1)

    # pre-trace the (1, window) device programs on a throwaway stream so
    # the first connection's first chunk doesn't pay trace+compile latency
    warm = StreamingRecognizer(params, mstate, mcfg, acfg, tok, **rec_kw)
    warm.accept_waveform(np.zeros(warm.win_samples, np.float32))
    warm.finish()

    class Handler(socketserver.StreamRequestHandler):
        def _reply(self, obj):
            self.wfile.write((json.dumps(obj) + "\n").encode())
            self.wfile.flush()

        def handle(self):
            try:
                header = json.loads(self.rfile.readline() or b"null")
            except json.JSONDecodeError:
                header = None
            if not isinstance(header, dict):
                return self._reply({"error": "expected a JSON header line"})
            if header.get("format", "s16le") != "s16le":
                return self._reply({"error": "only s16le PCM is supported"})
            if int(header.get("sample_rate",
                              acfg.sample_rate)) != acfg.sample_rate:
                return self._reply(
                    {"error": f"server decodes {acfg.sample_rate} Hz "
                              f"audio; resample before streaming"})
            rec = StreamingRecognizer(params, mstate, mcfg, acfg, tok,
                                      **rec_kw)
            carry = b""
            while True:
                # read1 from the SAME buffered reader as the header line
                # — readline() may have buffered the first PCM bytes, and
                # a raw recv() would silently drop them (timing race)
                data = self.rfile.read1(65536)
                if not data:
                    break
                carry += data
                usable = len(carry) // 2 * 2
                if not usable:
                    continue
                pcm = np.frombuffer(carry[:usable], np.int16)
                carry = carry[usable:]
                out = rec.accept_waveform(pcm.astype(np.float32) / 32768.0)
                if out:
                    self._reply({"partial": out})
            rec.finish()
            self._reply({"final": rec.transcript, "ids": rec.ids,
                         "exits_run": rec.exits_run})

    srv = _Server(("127.0.0.1", int(extra["--port"])), Handler)
    if port_holder is not None:
        port_holder.append(srv.server_address[1])
    return srv


def selftest():
    """Spawn the server in-process with a tiny model; stream a synthetic
    waveform through a real socket; verify the final transcript equals a
    local recognizer's output."""
    from early_exit_tpu.cli import get_args
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.serving import StreamingRecognizer

    tiny = ["--d_model", "32", "--n_enc_exits", "2",
            "--n_enc_layers_per_exit", "1", "--n_heads", "4",
            "--d_feed_forward", "64", "--depthwise_kernel_size", "7",
            "--compute_dtype", "float32"]
    holder = []
    srv = make_server(tiny + ["--port", "0", "--chunk_s", "0.5",
                              "--left_s", "1.0", "--right_s", "0.2"],
                      port_holder=holder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(int(2.5 * 16000))).astype(np.float32)
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)

    with socket.create_connection(("127.0.0.1", holder[0])) as s:
        s.sendall(json.dumps({"sample_rate": 16000,
                              "format": "s16le"}).encode() + b"\n")
        for i in range(0, len(pcm), 4000):
            s.sendall(pcm[i:i + 4000].tobytes())
        s.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            d = s.recv(65536)
            if not d:
                break
            buf += d
    msgs = [json.loads(line) for line in buf.decode().splitlines()]
    final = [m for m in msgs if "final" in m]
    assert len(final) == 1, msgs
    srv.shutdown()

    # oracle: same audio through a local recognizer (dequantised like
    # the server does)
    args, mcfg, tcfg, acfg, tok = get_args(
        ["--decoder_mode", "ctc"] + tiny)
    model = build_model(mcfg)
    params, mstate = model.init(jax.random.PRNGKey(args.seed), mcfg)
    rec = StreamingRecognizer(params, mstate, mcfg, acfg, tok,
                              chunk_s=0.5, left_s=1.0, right_s=0.2,
                              causal_attention=False)  # the server default
    rec.accept_waveform(pcm.astype(np.float32) / 32768.0)
    rec.finish()
    assert final[0]["ids"] == rec.ids, (final[0]["ids"], rec.ids)
    print(json.dumps({"selftest": "ok", "ids": final[0]["ids"],
                      "final": final[0]["final"]}))


def main():
    argv = sys.argv[1:]
    if "--selftest" in argv:
        return selftest()
    holder = []
    srv = make_server(argv, port_holder=holder)
    print(f"serving on 127.0.0.1:{holder[0]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
