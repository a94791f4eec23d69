"""Train the small deterministic BPE fixture vocab vendored under
``image_retrieval_tpu/models/bpe_fixture/``.

The real deployment loads openai/clip-vit-base-patch32's vocab.json +
merges.txt from ``Config.weights_path`` (zero-egress here, so it can't be
vendored). This tool trains a miniature vocab with the SAME format and
semantics — byte-level symbols, ``</w>`` end-of-word markers, HF-style
merges.txt — so the production path always runs the real BPE algorithm
(reference text path: ``image_search.py:47-64`` via HF CLIPProcessor).

Classic BPE training (Sennrich et al., 2016): start from the 512 base
symbols (256 byte-unicode chars, each also with ``</w>``), repeatedly merge
the most frequent adjacent pair over a fixed built-in corpus. Fully
deterministic: ties break by lexicographic pair order.

Run from the repo root:  python tools/make_bpe_fixture.py
"""

from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_retrieval_tpu.models.tokenizer import (  # noqa: E402
    _CLIP_SPLIT,
    byte_to_unicode,
    normalize_text,
)

NUM_MERGES = 768

# Deterministic training corpus: the retrieval domain's vocabulary (color /
# category words from the reference's dataset builder, imageProcessing.py:60-62),
# query-like phrases, contractions, digits, punctuation, and some non-ASCII so
# the byte fallback path gets exercised.
CORPUS = """
a photo of a white car on the street . a black dog runs in the park .
a brown chair near the table . the red apple and the green bottle .
a picture of a cat sitting on a couch . two people riding bicycles .
white black brown red green blue yellow orange purple gray
car chair couch bottle cup bowl banana apple orange dog cat horse bird
a white dog . a black cat . a brown horse . a white bird on a branch .
an image showing a person holding an umbrella in the rain .
the quick brown fox jumps over the lazy dog . it's a dog's life , isn't it ?
we're searching images ; they've labeled colors ; i'm testing queries .
he'll find the picture ; she'd searched all day ; you've seen it all .
1 2 3 4 5 6 7 8 9 0 top 10 results for query 42 at threshold 0 . 25
embedding similarity search retrieval metric cosine angle distance
magnitude vector image text query gallery index shard mesh color dataset
mutual information analysis pair category relationship same different
naive cafe , resume , jalapeno — naïve café , résumé , jalapeño !
zürich über straße ; 東京 猫 犬 ; привет мир ; مرحبا
a a a the the the of of in in on on and and with with is is are are
photo photos image images picture pictures search searching searched
""".strip()


def train(num_merges: int = NUM_MERGES):
    b2u = byte_to_unicode()
    base = [b2u[b] for b in range(256)]

    # word frequencies over the corpus, pre-tokenized exactly like encode()
    words = collections.Counter()
    for tok in _CLIP_SPLIT.findall(normalize_text(CORPUS)):
        mapped = "".join(b2u[b] for b in tok.encode("utf-8"))
        words[mapped] += 1

    # each word as its symbol sequence (last symbol carries </w>)
    seqs = {w: tuple(list(w[:-1]) + [w[-1] + "</w>"]) for w in words}

    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        best_freq = max(pairs.values())
        if best_freq < 2:  # merging hapax pairs just memorizes the corpus
            break
        best = min(p for p, c in pairs.items() if c == best_freq)
        merges.append(best)
        fused = best[0] + best[1]
        for w in words:
            s = seqs[w]
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(fused)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)

    # CLIP vocab layout: bytes, bytes</w>, merged tokens, then specials.
    tokens = base + [c + "</w>" for c in base] + [a + b for a, b in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    return vocab, merges


def main() -> None:
    vocab, merges = train()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "image_retrieval_tpu",
        "models",
        "bpe_fixture",
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(vocab)} tokens, {len(merges)} merges -> {out_dir}")


if __name__ == "__main__":
    main()
