"""Minimal protobuf wire-format reader for SentencePiece `.model` files.

We read the serialized ModelProto directly (no protobuf runtime, no
generated code): enough of the wire format to extract the vocabulary
(pieces + scores + types) and the trainer/normalizer options the encoder
needs. Byte-compatible with the artifacts the reference loads at
util/conf.py:473-474 (`sentencepiece/build/libri.bpe-256.model`).

Wire format: each field is a varint key (field_number << 3 | wire_type);
wire types used by ModelProto: 0 = varint, 2 = length-delimited,
5 = 32-bit (float).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Tuple

# SentencePiece piece types (ModelProto.SentencePiece.Type)
NORMAL = 1
UNKNOWN = 2
CONTROL = 3
USER_DEFINED = 4
UNUSED = 5
BYTE = 6


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: bytes):
    """Yields (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wtype = key >> 3, key & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            val = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif wtype == 1:
            val = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wtype} at {pos}")
        yield field, wtype, val


@dataclasses.dataclass
class SentencePieceEntry:
    piece: str
    score: float
    type: int = NORMAL


@dataclasses.dataclass
class ModelData:
    pieces: List[SentencePieceEntry]
    trainer: Dict[str, object]
    normalizer: Dict[str, object]


def _parse_piece(buf: bytes) -> SentencePieceEntry:
    piece, score, ptype = "", 0.0, NORMAL
    for field, _, val in iter_fields(buf):
        if field == 1:
            piece = val.decode("utf-8")
        elif field == 2:
            score = float(val)
        elif field == 3:
            ptype = int(val)
    return SentencePieceEntry(piece, score, ptype)


# TrainerSpec field numbers we care about
_TRAINER_FIELDS = {3: "model_type", 4: "vocab_size", 40: "unk_id",
                   41: "bos_id", 42: "eos_id", 43: "pad_id"}
# NormalizerSpec field numbers
_NORM_FIELDS = {1: "name", 3: "add_dummy_prefix",
                4: "remove_extra_whitespaces", 5: "escape_whitespaces"}


def _parse_spec(buf: bytes, mapping) -> Dict[str, object]:
    out = {}
    for field, wtype, val in iter_fields(buf):
        if field in mapping:
            if isinstance(val, bytes):
                try:
                    val = val.decode("utf-8")
                except UnicodeDecodeError:
                    pass
            out[mapping[field]] = val
    return out


def parse_model(path: str) -> ModelData:
    with open(path, "rb") as f:
        buf = f.read()
    pieces: List[SentencePieceEntry] = []
    trainer: Dict[str, object] = {}
    normalizer: Dict[str, object] = {}
    for field, wtype, val in iter_fields(buf):
        if field == 1 and wtype == 2:           # repeated SentencePiece
            pieces.append(_parse_piece(val))
        elif field == 2 and wtype == 2:         # TrainerSpec
            trainer = _parse_spec(val, _TRAINER_FIELDS)
        elif field == 3 and wtype == 2:         # NormalizerSpec
            normalizer = _parse_spec(val, _NORM_FIELDS)
    return ModelData(pieces, trainer, normalizer)
