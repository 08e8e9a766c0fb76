"""Generate a FULL-SIZE (256,384-entry) synthetic umT5-layout tokenizer.

The production tokenizer is ``google/umt5-xxl``: sentencepiece Unigram,
vocab 256384 (``wan/modules/t5.py:462``), pad=<pad>=0, eos=</s>=1,
unk=<unk>=2, Metaspace word-boundary pre-tokenization, append-``</s>``
post-processing. Its assets cannot be fetched in a zero-egress
environment, so this builds a structurally-faithful stand-in at the
EXACT production vocab size: the same model family (Unigram), the same
special-token layout, the same post-processing — only the piece
inventory is synthetic (all printable-ASCII coverage plus generated
multi-char pieces with Zipf-ish log-probs). This closes the r3
"tokenizer tested only on a tiny vocab" gap: the real HF fast-tokenizer
path (Viterbi segmentation over a 256,384-piece table) and the T5
embedding gather both run at production vocab size.

Deterministic: fixed piece generator → byte-identical assets; re-run to
regenerate. Not vendored (≈6 MB): tests build it session-scoped.

Usage:
    python tools/make_full_tokenizer.py [out_dir]
"""

import json
import math
import os
import string
import sys

VOCAB_SIZE = 256384  # ref wan/modules/t5.py:462


def _pieces(n: int):
    """Deterministic piece inventory: full printable-ASCII coverage
    (so any input segments without <unk>), then '▁'-prefixed and plain
    multi-char combinations until ``n`` pieces exist."""
    seen = set()
    out = []

    def add(p):
        if p and p not in seen:
            seen.add(p)
            out.append(p)

    # coverage: every printable char + its word-initial form
    for ch in string.printable:
        if ch in "\t\n\r\x0b\x0c":
            continue
        add(ch)
        add("▁" + ch)
    add("▁")

    alpha = string.ascii_lowercase
    # 2-char, then 3-char, then 4-char pieces, word-initial first
    from itertools import product

    for klen in (2, 3, 4):
        for combo in product(alpha, repeat=klen):
            if len(out) >= n:
                return out[:n]
            s = "".join(combo)
            add("▁" + s)
            add(s)
    raise RuntimeError(f"piece generator exhausted at {len(out)} < {n}")


def build(out_dir: str, vocab_size: int = VOCAB_SIZE) -> str:
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace
    from tokenizers.processors import TemplateProcessing

    specials = ["<pad>", "</s>", "<unk>"]
    body = _pieces(vocab_size - len(specials))
    vocab = [(s, 0.0) for s in specials] + [
        # Zipf-ish score by rank; shorter pieces score better so the
        # Viterbi segmentation behaves like a real LM-trained table
        (p, -math.log(r + 10) - 0.5 * len(p))
        for r, p in enumerate(body)]
    assert len(vocab) == vocab_size

    tok = Tokenizer(Unigram(vocab, unk_id=2, byte_fallback=False))
    tok.pre_tokenizer = Metaspace()
    tok.post_processor = TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)])

    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "pad_token": "<pad>",
            "eos_token": "</s>",
            "unk_token": "<unk>",
            "model_max_length": 512,
        }, f, indent=1)
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as f:
        json.dump({"pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>"}, f, indent=1)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/moviigen_full_tokenizer"
    build(out)
    print(f"wrote {out} (vocab {VOCAB_SIZE})")
