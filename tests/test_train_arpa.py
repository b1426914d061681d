"""tools/train_arpa.py — the in-framework ARPA n-gram trainer.

The reference assumes an externally-trained KenLM for shallow fusion
(util/beam_infer.py:77-78); ours can train its own. These tests pin that
the output is a PROPER language model (per-context distributions sum to
1) and that the native Katz-backoff reader (csrc/beam/arpa_lm.cc)
consumes it directly.
"""

import importlib.util
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "train_arpa", os.path.join(REPO, "tools", "train_arpa.py"))
train_arpa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(train_arpa)

SENTS = [s.split() for s in [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat saw the dog",
    "dogs and cats sat",
]]


@pytest.fixture(scope="module", params=[2, 3])
def tables(request):
    return request.param, train_arpa.train(SENTS, order=request.param)


def _vocab(tables):
    return [w for (w,) in tables[1] if w != "<s>"]


def test_unigrams_sum_to_one(tables):
    _, t = tables
    total = sum(10.0 ** lp for (w,), (lp, _) in t[1].items() if w != "<s>")
    assert abs(total - 1.0) < 1e-6


def test_bigram_distributions_are_proper(tables):
    order, t = tables

    def prob(ng):
        ent = t[len(ng)].get(ng)
        if ent is not None:
            return 10.0 ** ent[0]
        if len(ng) == 1:
            return 10.0 ** t[1][("<unk>",)][0]
        b = t[len(ng) - 1].get(ng[:-1])
        bow = 10.0 ** b[1] if b is not None and b[1] is not None else 1.0
        return bow * prob(ng[1:])

    vocab = _vocab(t)
    for ctx in [("the",), ("cat",), ("<s>",), ("sat",)]:
        total = sum(prob(ctx + (w,)) for w in vocab)
        assert abs(total - 1.0) < 1e-4, f"context {ctx}: sums to {total}"
    if order == 3:
        for ctx in [("the", "cat"), ("sat", "on"), ("<s>", "the")]:
            total = sum(prob(ctx + (w,)) for w in vocab)
            assert abs(total - 1.0) < 1e-4, f"context {ctx}: sums to {total}"


def test_native_reader_consumes_output(tables, tmp_path):
    order, t = tables
    path = str(tmp_path / "lm.arpa")
    train_arpa.write_arpa(t, path)

    from early_exit_tpu.decoding.ngram_lm import ArpaLM
    lm = ArpaLM(path)
    assert lm.order == order
    # frequent sentence scores higher than a shuffled improbable one
    hi = lm.score(["the", "cat", "sat"])
    lo = lm.score(["sat", "the", "log", "a"])
    assert hi > lo
    # every score is a finite negative log-prob
    assert math.isfinite(hi) and hi < 0.0


def test_cli_writes_file(tmp_path):
    text = tmp_path / "text.txt"
    text.write_text("\n".join(" ".join(s) for s in SENTS) + "\n")
    out = tmp_path / "out.arpa"
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_arpa.py"),
         "--text", str(text), "--out", str(out), "--order", "2"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    head = out.read_text().splitlines()[0]
    assert head == "\\data\\"
