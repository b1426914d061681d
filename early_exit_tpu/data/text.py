"""Transcript cleaning + target encoding.

Parity with the reference collate fns:
- training label cleaning (util/data_loader.py:196-197): drop "<unk>" and
  "[ unclear ]", then strip the characters #^$?:;.![]
- inference cleaning (util/data_loader.py:252): strip #^$,?:;.! and <unk>,
  and skip utterances containing "ignore_time_segment_in_scoring"
- items with cleaned label length >= max_utterance_length are dropped
  (util/data_loader.py:199,221)
- BPE targets are [bos] + encode(label) + [eos] (util/data_loader.py:207-209);
  char-mode targets are "^label$" lowercased (util/data_loader.py:211-212)
"""

from __future__ import annotations

import re
from typing import List, Optional

_TRAIN_DROP = re.compile(r"<unk>|\[ unclear \]")
_TRAIN_PUNCT = re.compile(r"[#^$?:;.!\[\]]+")
_INFER_PUNCT = re.compile(r"[#^$,?:;.!]+|<unk>")


def clean_train_label(label: str) -> str:
    label = _TRAIN_DROP.sub("", label)
    return _TRAIN_PUNCT.sub("", label)


def clean_infer_label(label: str) -> Optional[str]:
    label = _INFER_PUNCT.sub("", label)
    if "ignore_time_segment_in_scoring" in label:
        return None
    return label


def encode_target(label: str, tokenizer, *, bpe: bool = True) -> List[int]:
    """Target ids incl. BOS/EOS, as fed to both CE and CTC losses."""
    if bpe:
        return ([tokenizer.bos_id()] + tokenizer.encode_as_ids(label)
                + [tokenizer.eos_id()])
    return tokenizer.text_to_int("^" + label.lower() + "$")
