"""Reference-checkpoint import (early_exit_tpu/interop.py).

torchaudio is not installed here, so these tests carry a pure-torch
replica of torchaudio's ``Conformer`` module layout (torchaudio
models/conformer.py: _FeedForwardModule / _ConvolutionModule /
ConformerLayer — same Sequential indices, same parameter names, bias=True
convs, BatchNorm1d, convolution_first=False) wrapped exactly like the
reference's Early_conformer (models/model/early_exit.py:565-634):
Conv1dSubampling → PositionalEncoding → per exit [Conformer stack +
Linear head + log_softmax]. A random-init replica's state_dict must
import and reproduce the torch forward numerically (full-length batches:
padding semantics intentionally differ — we zero padded frames between
blocks, torchaudio lets convs read them; conformer.py docstring)."""

import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402

from early_exit_tpu import interop  # noqa: E402
from early_exit_tpu.configs import ModelConfig  # noqa: E402
from early_exit_tpu.models import early_conformer, splitformer  # noqa: E402


# ---------- pure-torch replica of the torchaudio layout ----------

class _FFN(nn.Module):
    def __init__(self, d, ff, p=0.1):
        super().__init__()
        self.sequential = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, ff), nn.SiLU(), nn.Dropout(p),
            nn.Linear(ff, d), nn.Dropout(p))

    def forward(self, x):
        return self.sequential(x)


class _ConvModule(nn.Module):
    def __init__(self, d, k, p=0.1):
        super().__init__()
        self.layer_norm = nn.LayerNorm(d)
        self.sequential = nn.Sequential(
            nn.Conv1d(d, 2 * d, 1, bias=True),
            nn.GLU(dim=1),
            nn.Conv1d(d, d, k, padding=(k - 1) // 2, groups=d, bias=True),
            nn.BatchNorm1d(d),
            nn.SiLU(),
            nn.Conv1d(d, d, 1, bias=True),
            nn.Dropout(p))

    def forward(self, x):                       # (B, T, D)
        x = self.layer_norm(x)
        x = x.transpose(1, 2)
        x = self.sequential(x)
        return x.transpose(1, 2)


class _ConformerLayer(nn.Module):
    def __init__(self, d, ff, heads, k, p=0.1):
        super().__init__()
        self.ffn1 = _FFN(d, ff, p)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, heads, dropout=p)
        self.self_attn_dropout = nn.Dropout(p)
        self.conv_module = _ConvModule(d, k, p)
        self.ffn2 = _FFN(d, ff, p)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, key_padding_mask):     # (T, B, D)
        residual = x
        x = self.ffn1(x) * 0.5 + residual
        residual = x
        y = self.self_attn_layer_norm(x)
        y, _ = self.self_attn(y, y, y, key_padding_mask=key_padding_mask,
                              need_weights=False)
        x = self.self_attn_dropout(y) + residual
        residual = x
        x = residual + self.conv_module(x.transpose(0, 1)).transpose(0, 1)
        residual = x
        x = self.ffn2(x) * 0.5 + residual
        return self.final_layer_norm(x)


class _Conformer(nn.Module):
    """torchaudio Conformer: ModuleList named conformer_layers."""

    def __init__(self, d, ff, heads, k, num_layers, p=0.1):
        super().__init__()
        self.conformer_layers = nn.ModuleList(
            [_ConformerLayer(d, ff, heads, k, p) for _ in range(num_layers)])

    def forward(self, x, lengths):              # (B, T, D)
        T = x.size(1)
        pad = (torch.arange(T)[None, :] >= lengths[:, None])
        x = x.transpose(0, 1)
        for layer in self.conformer_layers:
            x = layer(x, pad)
        return x.transpose(0, 1), lengths


class _Subsample(nn.Module):                    # reference Conv1dSubampling
    def __init__(self, c_in, c_out):
        super().__init__()
        self.sequential = nn.Sequential(
            nn.Conv1d(c_in, c_out, 3, stride=2, padding=0),
            nn.Conv1d(c_out, c_out, 3, stride=2, padding=0))

    def forward(self, x):
        return self.sequential(x)


class _PE(nn.Module):                           # reference PositionalEncoding
    def __init__(self, d, max_len=5000):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * (-math.log(10000.0) / d))
        pe = torch.zeros(max_len, 1, d)
        pe[:, 0, 0::2] = torch.sin(position * div)
        pe[:, 0, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x):                       # (B, T, D)
        x = x.permute(1, 0, 2)
        x = x + self.pe[:x.size(0)]
        return x.permute(1, 0, 2)


class _RefEarlyConformer(nn.Module):
    """Reference Early_conformer wiring (early_exit.py:565-634)."""

    def __init__(self, cfg, parallel=False):
        super().__init__()
        d, ff = cfg.d_model, cfg.d_feed_forward
        self.conv_subsample = _Subsample(cfg.n_mels, d)
        self.positional_encoder = _PE(d, cfg.max_len)
        self.linears = nn.ModuleList(
            [nn.Linear(d, cfg.vocab_size) for _ in range(cfg.n_enc_exits)])
        self.conformer = nn.ModuleList(
            [_Conformer(d, ff, cfg.n_heads, cfg.depthwise_kernel_size,
                        cfg.n_enc_layers_per_exit)
             for _ in range(cfg.n_enc_exits)])
        if parallel:                            # Splitformer extras
            self.conformer_parallel = nn.ModuleList(
                [_Conformer(d, ff, cfg.n_heads, cfg.depthwise_kernel_size,
                            1) for _ in range(2)])

    def forward(self, feats, lengths):          # feats (B, n_mels, T)
        src = self.conv_subsample(feats)
        src = self.positional_encoder(src.permute(0, 2, 1))
        length = torch.clamp(lengths / 4, max=src.size(1)).to(torch.int)
        outs = []
        enc = src
        for linear, stack in zip(self.linears, self.conformer):
            enc, _ = stack(enc, length)
            outs.append(torch.nn.functional.log_softmax(linear(enc),
                                                        dim=2)[None])
        return torch.cat(outs)


CFG = ModelConfig(d_model=32, n_heads=4, d_feed_forward=48,
                  n_enc_exits=2, n_enc_layers_per_exit=2,
                  depthwise_kernel_size=7, vocab_size=11, n_mels=9,
                  compute_dtype="float32", length_mode="reference")
# the import tool resolves vocab from the tokenizer (char = 32)
CFG2 = ModelConfig(**{**CFG.__dict__, "vocab_size": 32})


def _torch_model_and_sd(cfg, parallel=False, seed=0):
    torch.manual_seed(seed)
    m = _RefEarlyConformer(cfg, parallel=parallel).eval()
    # non-trivial BatchNorm running stats so the import of state is tested
    with torch.no_grad():
        m.train()
        for _ in range(3):
            m(torch.randn(2, cfg.n_mels, 61), torch.tensor([61, 61]))
        m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    return m, sd


def test_early_conformer_import_matches_torch_forward():
    m, sd = _torch_model_and_sd(CFG)
    params, state = interop.from_reference_state_dict(sd, CFG)
    B, T = 2, 61
    torch.manual_seed(1)
    feats_t = torch.randn(B, CFG.n_mels, T)
    with torch.no_grad():
        want = m(feats_t, torch.tensor([T, T])).numpy()
    got, sub_len, _ = early_conformer.apply(
        params, state, np.asarray(feats_t.numpy().transpose(0, 2, 1)),
        np.asarray([T, T]), CFG, train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_splitformer_parallel_blocks_imported():
    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "splitformer"})
    m, sd = _torch_model_and_sd(cfg, parallel=True)
    params, state = interop.from_reference_state_dict(sd, cfg)
    assert len(params["parallel"]) == 2
    # trunk weights identical to the early_conformer mapping of the
    # same tensors; parallel branch consumed (finish() would have
    # raised otherwise). Forward runs:
    out, sub_len, _ = splitformer.apply(
        params, state, np.zeros((1, 61, cfg.n_mels), np.float32),
        np.asarray([61]), cfg, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_keys_rejected():
    _, sd = _torch_model_and_sd(CFG)
    sd["decoders.0.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        interop.from_reference_state_dict(sd, CFG)


def test_missing_keys_rejected():
    _, sd = _torch_model_and_sd(CFG)
    del sd["linears.1.weight"]
    with pytest.raises(KeyError, match="linears.1.weight"):
        interop.from_reference_state_dict(sd, CFG)


def test_shape_mismatch_rejected():
    _, sd = _torch_model_and_sd(CFG)
    bad = ModelConfig(**{**CFG.__dict__, "d_feed_forward": 64})
    with pytest.raises(ValueError, match="shape"):
        interop.from_reference_state_dict(sd, bad)


def test_import_tool_end_to_end(tmp_path):
    import tools.import_reference_checkpoint as tool

    # the tool resolves vocab from the tokenizer (--bpe false -> 32)
    _, sd = _torch_model_and_sd(CFG2)
    pt = os.path.join(tmp_path, "mod007-transformer")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pt)
    out = os.path.join(tmp_path, "imported")
    tool.main(["--torch_ckpt", pt, "--out", out,
               "--decoder_mode", "ctc", "--bpe", "false",
               "--d_model", "32", "--n_heads", "4",
               "--d_feed_forward", "48", "--n_enc_exits", "2",
               "--n_enc_layers_per_exit", "2",
               "--depthwise_kernel_size", "7", "--n_mels", "9",
               "--compute_dtype", "float32",
               "--length_mode", "reference"])
    assert os.path.exists(out)
    # loadable through the standard checkpoint path
    from early_exit_tpu.training import checkpoint
    t_params, t_state = early_conformer.init(jax.random.PRNGKey(0), CFG2)
    params, state = checkpoint.load_model_file(out, t_params, t_state)
    o, _, _ = early_conformer.apply(
        params, state, np.zeros((1, 61, CFG2.n_mels), np.float32),
        np.asarray([61]), CFG2, train=False)
    assert np.isfinite(np.asarray(o)).all()




# ---------- AED full_conformer import ----------

class _RefFullConformer(nn.Module):
    """Reference full_conformer wiring (early_exit.py:637-811): per-exit
    encoder stacks + CTC heads + torch TransformerDecoders sharing ONE
    final LayerNorm module (registered as `layer_norm` and as each
    decoder's `norm`)."""

    def __init__(self, cfg, n_dec_layers=2):
        super().__init__()
        d, ff, E = cfg.d_model, cfg.d_feed_forward, cfg.n_enc_exits
        self.layer_norm = nn.LayerNorm(d, eps=1e-5)
        self.emb = nn.Embedding(cfg.vocab_size, d)
        self.conv_subsample = _Subsample(cfg.n_mels, d)
        self.linears_1 = nn.ModuleList(
            [nn.Linear(d, cfg.vocab_size) for _ in range(E)])
        self.linears_2 = nn.ModuleList(
            [nn.Linear(d, cfg.vocab_size) for _ in range(E)])
        self.positional_encoder_1 = _PE(d, cfg.max_len)
        self.positional_encoder_2 = _PE(d, cfg.max_len)
        self.conformer = nn.ModuleList(
            [_Conformer(d, ff, cfg.n_heads, cfg.depthwise_kernel_size,
                        cfg.n_enc_layers_per_exit) for _ in range(E)])
        self.decoders = nn.ModuleList(
            [nn.TransformerDecoder(
                nn.TransformerDecoderLayer(
                    d_model=d, nhead=cfg.n_heads, dim_feedforward=ff,
                    dropout=0.1, batch_first=True, norm_first=True),
                n_dec_layers, self.layer_norm) for _ in range(E)])
        self.trg_pad_idx = cfg.pad_id

    def forward(self, src, lengths, trg):
        src = self.conv_subsample(src)
        src = self.positional_encoder_1(src.permute(0, 2, 1))
        length = torch.clamp(lengths / 4, max=src.size(1)).to(torch.int)
        L = trg.size(1)
        tgt_mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        tgt_kpm = trg == self.trg_pad_idx
        x = self.positional_encoder_2(self.emb(trg))
        enc = src
        enc_out, dec_out = [], []
        for lin1, lin2, stack, dec in zip(self.linears_1, self.linears_2,
                                          self.conformer, self.decoders):
            enc, _ = stack(enc, length)
            enc_out.append(
                torch.nn.functional.log_softmax(lin1(enc), dim=2)[None])
            y = dec(x, enc, tgt_mask=tgt_mask,
                    tgt_key_padding_mask=tgt_kpm)
            dec_out.append(
                torch.nn.functional.log_softmax(lin2(y), dim=2)[None])
        return torch.cat(enc_out), torch.cat(dec_out)


def test_full_conformer_import_matches_torch_forward():
    from early_exit_tpu.models import full_conformer

    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "full_conformer",
                         "n_dec_layers": 2, "pad_id": 9, "vocab_size": 11})
    torch.manual_seed(3)
    m = _RefFullConformer(cfg, n_dec_layers=2).eval()
    with torch.no_grad():
        m.train()
        for _ in range(2):
            m(torch.randn(2, cfg.n_mels, 61), torch.tensor([61, 61]),
              torch.tensor([[1, 4, 5, 2], [1, 6, 2, 9]]))
        m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, state = interop.from_reference_state_dict(sd, cfg)

    B, T = 2, 61
    torch.manual_seed(4)
    feats_t = torch.randn(B, cfg.n_mels, T)
    trg = torch.tensor([[1, 4, 5, 2], [1, 6, 2, 9]])   # row 2 pad-tailed
    with torch.no_grad():
        want_enc, want_dec = m(feats_t, torch.tensor([T, T]), trg)
    dec_logits, enc_lp, sub_len, _ = full_conformer.apply(
        params, state, np.asarray(feats_t.numpy().transpose(0, 2, 1)),
        np.asarray([T, T]), np.asarray(trg.numpy()), cfg, train=False)
    got_dec = jax.nn.log_softmax(
        np.asarray(dec_logits, np.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(enc_lp), want_enc.numpy(),
                               atol=2e-4)
    # padded target rows produce garbage at pad positions in both
    # implementations but are masked from the loss; compare valid ones
    valid = (trg != cfg.pad_id).numpy()
    np.testing.assert_allclose(
        np.asarray(got_dec)[:, valid.nonzero()[0], valid.nonzero()[1]],
        want_dec.numpy()[:, valid.nonzero()[0], valid.nonzero()[1]],
        atol=3e-4)


# ---------- early_zipformer import ----------

class _RefZipformer(nn.Module):
    """Reference Early_zipformer wiring (early_exit.py:117-224):
    Conv1dSubampling_Zipformer (attr `conv`) -> PE -> 2 full-rate blocks
    -> 5 U-Net stages (pad to factor, downsample, stack, upsample,
    unpad, residual) -> output downsample(2) -> one Linear head."""

    FACTORS = [2, 4, 8, 4, 2]
    STACK = [2, 4, 5, 4, 2]

    def __init__(self, cfg):
        super().__init__()
        d, ff = cfg.d_model, cfg.d_feed_forward
        self.conv_subsample = nn.Module()
        self.conv_subsample.conv = nn.Conv1d(cfg.n_mels, d, 3, stride=2)
        self.positional_encoder = _PE(d, cfg.max_len)
        self.linear = nn.Linear(d, cfg.vocab_size)
        n_blocks = 2 + sum(self.STACK)
        self.conformer = nn.ModuleList(
            [_Conformer(d, ff, cfg.n_heads, cfg.depthwise_kernel_size,
                        cfg.n_enc_layers_per_exit)
             for _ in range(n_blocks)])

    def forward(self, src, lengths):            # src (B, n_mels, T)
        src = self.conv_subsample.conv(src)
        src = self.positional_encoder(src.permute(0, 2, 1))
        base = torch.clamp(lengths / 2, max=src.size(1)).to(torch.int)
        enc, _ = self.conformer[0](src, base)
        enc, _ = self.conformer[1](enc, base)
        for idx in range(len(self.STACK)):
            skip = enc
            factor = self.FACTORS[idx]
            ci = 2 + sum(self.STACK[:idx])
            pad = enc.size(1) % factor
            if pad != 0:
                pad = factor - pad
                enc = torch.cat(
                    (enc, torch.zeros(enc.size(0), pad, enc.size(2))), 1)
            enc = enc[:, ::factor, :]
            length = torch.clamp((lengths + pad) / factor,
                                 max=enc.size(1)).to(torch.int)
            for i in range(ci, ci + self.STACK[idx]):
                enc, _ = self.conformer[i](enc, length)
            enc = torch.repeat_interleave(enc, factor, dim=1)
            if pad != 0:
                enc = enc[:, :-pad, :]
            enc = enc + skip
        out = self.linear(enc[:, ::2, :])
        return torch.nn.functional.log_softmax(out, dim=2)[None]


def test_zipformer_import_matches_torch_forward():
    from early_exit_tpu.models import zipformer

    cfg = ModelConfig(**{**CFG.__dict__, "model_type": "early_zipformer",
                         "n_enc_exits": 19, "n_enc_layers_per_exit": 1})
    torch.manual_seed(5)
    m = _RefZipformer(cfg).eval()
    with torch.no_grad():
        m.train()
        m(torch.randn(2, cfg.n_mels, 127), torch.tensor([127, 127]))
        m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, state = interop.from_reference_state_dict(sd, cfg)

    B, T = 2, 127                       # odd T: clamp(len/2) == conv T'
    torch.manual_seed(6)
    feats_t = torch.randn(B, cfg.n_mels, T)
    with torch.no_grad():
        want = m(feats_t, torch.tensor([T, T])).numpy()
    got, out_len, _ = zipformer.apply(
        params, state, np.asarray(feats_t.numpy().transpose(0, 2, 1)),
        np.asarray([T, T]), cfg, train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_import_tool_aed_end_to_end(tmp_path):
    """The tool's smoke forward must handle full_conformer's
    (feats, lengths, trg) signature (regression: it crashed)."""
    import tools.import_reference_checkpoint as tool
    from early_exit_tpu.cli import get_args

    flags = ["--decoder_mode", "aed", "--bpe", "false",
             "--d_model", "32", "--n_heads", "4",
             "--d_feed_forward", "48", "--n_enc_exits", "2",
             "--n_enc_layers_per_exit", "2", "--n_dec_layers", "2",
             "--depthwise_kernel_size", "7", "--n_mels", "9",
             "--compute_dtype", "float32", "--length_mode", "reference"]
    _, model_cfg, _, _, _ = get_args(flags, mode="infer")
    torch.manual_seed(7)
    m = _RefFullConformer(model_cfg, n_dec_layers=2).eval()
    sd = m.state_dict()
    pt = os.path.join(tmp_path, "mod001-transformer")
    torch.save(sd, pt)
    out = os.path.join(tmp_path, "imported-aed")
    tool.main(["--torch_ckpt", pt, "--out", out] + flags)
    assert os.path.exists(out)


# ---------- export (the inverse direction) ----------

@pytest.mark.parametrize("model_type", ["early_conformer", "splitformer",
                                        "early_zipformer",
                                        "full_conformer"])
def test_export_import_roundtrip(model_type):
    """our init -> to_reference_state_dict -> from_reference_state_dict
    must reproduce every leaf exactly, for every model family."""
    from early_exit_tpu.models.registry import build_model

    over = {"model_type": model_type}
    if model_type == "early_zipformer":
        over.update(n_enc_exits=19, n_enc_layers_per_exit=1)
    if model_type == "full_conformer":
        over.update(n_dec_layers=2)
    cfg = ModelConfig(**{**CFG.__dict__, **over})
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(42), cfg)
    sd = interop.to_reference_state_dict(params, state, cfg)
    params2, state2 = interop.from_reference_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves((params, state)),
                    jax.tree_util.tree_leaves((params2, state2))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=0,
                                   rtol=0)


def test_export_loads_strict_into_torch_replica():
    """Exported state_dicts must satisfy torch's strict load (key set
    AND shapes, incl. PE buffers and BatchNorm bookkeeping), and the
    re-loaded torch model must reproduce the source torch model."""
    m, sd = _torch_model_and_sd(CFG)
    params, state = interop.from_reference_state_dict(sd, CFG)
    out_sd = interop.to_reference_state_dict(params, state, CFG)
    m2 = _RefEarlyConformer(CFG).eval()
    m2.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in out_sd.items()}, strict=True)
    torch.manual_seed(2)
    feats = torch.randn(2, CFG.n_mels, 61)
    with torch.no_grad():
        a = m(feats, torch.tensor([61, 61])).numpy()
        b = m2(feats, torch.tensor([61, 61])).numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_export_tool_end_to_end(tmp_path):
    import tools.export_reference_checkpoint as tool
    from early_exit_tpu.training import checkpoint

    params, state = early_conformer.init(jax.random.PRNGKey(1), CFG2)
    ckpt = os.path.join(tmp_path, "mod001-transformer")
    checkpoint.save_pytree({"params": params, "model_state": state}, ckpt)
    out = os.path.join(tmp_path, "exported.pt")
    tool.main(["--ckpt", ckpt, "--out", out,
               "--decoder_mode", "ctc", "--bpe", "false",
               "--d_model", "32", "--n_heads", "4",
               "--d_feed_forward", "48", "--n_enc_exits", "2",
               "--n_enc_layers_per_exit", "2",
               "--depthwise_kernel_size", "7", "--n_mels", "9",
               "--compute_dtype", "float32",
               "--length_mode", "reference"])
    sd = torch.load(out)
    m = _RefEarlyConformer(CFG2).eval()
    m.load_state_dict(sd, strict=True)
