"""Train a BPE model with the native trainer and round-trip it through
both engines (C++ and Python), plus the CLI surface."""

import os
import shutil
import subprocess

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

CORPUS = """THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG
THE CAT SAT ON THE MAT AND THE DOG BARKED AT THE CAT
A QUICK BROWN DOG AND A LAZY FOX MET THE CAT ON THE MAT
THE THE THE QUICK QUICK BROWN BROWN CAT DOG FOX
"""


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from early_exit_tpu import _native
    d = tmp_path_factory.mktemp("bpe")
    corpus = d / "corpus.txt"
    corpus.write_text(CORPUS)
    prefix = str(d / "toy")
    lib = _native.get_lib()
    rc = lib.eet_bpe_train(str(corpus).encode(), prefix.encode(), 64,
                           63, 1, 2, 62, b"@")
    assert rc == 0
    return prefix


def test_artifacts_exist(trained):
    assert os.path.exists(trained + ".model")
    assert os.path.exists(trained + ".vocab")
    with open(trained + ".vocab", encoding="utf-8") as f:
        vocab = [l.split("\t")[0] for l in f]
    assert len(vocab) == 64
    assert "<unk>" in vocab and "<s>" in vocab and "@" in vocab


def test_python_engine_reads_trained_model(trained):
    from early_exit_tpu.tokenizer import SentencePieceBPE
    from early_exit_tpu.tokenizer import proto
    tok = SentencePieceBPE(proto.parse_model(trained + ".model"))
    assert tok.get_piece_size() == 64
    assert tok.bos_id() == 1 and tok.eos_id() == 2
    assert tok.pad_id() == 62 and tok.unk_id() == 63
    ids = tok.encode_as_ids("THE QUICK CAT")
    assert ids
    assert tok.decode(ids) == "THE QUICK CAT"
    # frequent words should compress well
    assert len(tok.encode_as_ids("THE")) <= 2


def test_native_engine_matches_python_on_trained_model(trained):
    from early_exit_tpu.tokenizer import SentencePieceBPE
    from early_exit_tpu.tokenizer import proto
    from early_exit_tpu.tokenizer.native import NativeBPE
    py = SentencePieceBPE(proto.parse_model(trained + ".model"))
    nat = NativeBPE(trained + ".model")
    for text in ["THE QUICK BROWN FOX", "CAT DOG", "UNSEEN WORDS HERE",
                 "A", ""]:
        assert nat.encode_as_ids(text) == py.encode_as_ids(text), text


def test_cli_train_encode_decode(tmp_path):
    from early_exit_tpu import _native
    cli = _native.build_cli()
    corpus = tmp_path / "c.txt"
    corpus.write_text(CORPUS)
    prefix = str(tmp_path / "m")
    r = subprocess.run([cli, "train", f"--input={corpus}",
                        f"--model_prefix={prefix}", "--vocab_size=64",
                        "--unk_id=63", "--bos_id=1", "--eos_id=2",
                        "--pad_id=62", "--user_defined_symbols=@"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    enc = subprocess.run([cli, "encode", f"--model={prefix}.model"],
                         input="THE CAT\n", capture_output=True,
                         text=True)
    assert enc.returncode == 0
    ids = enc.stdout.strip()
    assert ids
    dec = subprocess.run([cli, "decode", f"--model={prefix}.model"],
                         input=ids + "\n", capture_output=True, text=True)
    assert dec.stdout.strip() == "THE CAT"
    vocab = subprocess.run([cli, "export_vocab",
                            f"--model={prefix}.model"],
                           capture_output=True, text=True)
    assert len(vocab.stdout.strip().split("\n")) == 64


def test_cli_encode_matches_engine_on_reference_model():
    """The native CLI must reproduce the engine's ids on the reference's
    shipped BPE-256 model."""
    import os
    model = "/root/reference/sentencepiece/build/libri.bpe-256.model"
    if not os.path.exists(model):
        pytest.skip("reference artifacts not mounted")
    from early_exit_tpu import _native
    from early_exit_tpu.tokenizer.native import NativeBPE
    cli = _native.build_cli()
    eng = NativeBPE(model)
    text = "THE QUICK BROWN FOX"
    r = subprocess.run([cli, "encode", f"--model={model}"],
                       input=text + "\n", capture_output=True, text=True)
    ids = [int(x) for x in r.stdout.split()]
    assert ids == eng.encode_as_ids(text)
    d = subprocess.run([cli, "decode", f"--model={model}"],
                       input=" ".join(map(str, ids)) + "\n",
                       capture_output=True, text=True)
    assert d.stdout.strip() == text
