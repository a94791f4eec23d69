"""Text tokenization for the CLIP text tower.

Uses the real HF CLIP BPE tokenizer when its vocab files are available
(weights_path); this zero-egress environment usually has none, so a
deterministic hashing tokenizer provides a stable stand-in with the same
interface and special-token layout (BOS=49406, EOS=49407, pad=0, 77 max
positions). Embeddings from the hash tokenizer are reproducible across runs
— the property the reference's dummy-embedding fallback
(app_pipeline.py:136-141) lacked (it used unseeded np.random).
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional

import numpy as np

BOS = 49406
EOS = 49407
PAD = 0
CONTEXT = 77
VOCAB = 49408

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


class HashTokenizer:
    """Deterministic word-hash tokenizer with CLIP special-token layout."""

    context_length = CONTEXT

    def __call__(self, texts: List[str], context_length: int = CONTEXT) -> np.ndarray:
        out = np.full((len(texts), context_length), PAD, np.int32)
        for i, text in enumerate(texts):
            words = _WORD_RE.findall(text.lower().strip())
            ids = [BOS]
            for w in words[: context_length - 2]:
                h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "little")
                ids.append(1 + h % (BOS - 1))  # in [1, 49405]
            ids.append(EOS)
            out[i, : len(ids)] = ids[:context_length]
        return out


class HFCLIPTokenizer:
    """Real CLIP BPE tokenizer via transformers (requires local vocab files)."""

    context_length = CONTEXT

    def __init__(self, path: str):
        from transformers import CLIPTokenizerFast

        self._tok = CLIPTokenizerFast.from_pretrained(path)

    def __call__(self, texts: List[str], context_length: int = CONTEXT) -> np.ndarray:
        enc = self._tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=context_length,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


def get_tokenizer(weights_path: Optional[str] = None):
    if weights_path:
        try:
            return HFCLIPTokenizer(weights_path)
        except Exception:
            pass
    return HashTokenizer()
