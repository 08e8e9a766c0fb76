"""Generate the vendored tiny HF tokenizer asset (assets/tiny_tokenizer).

The production tokenizer is ``google/umt5-xxl`` (sentencepiece unigram,
vocab 256384) — its assets cannot be fetched in a zero-egress
environment, so tests would only ever exercise the deterministic hash
fallback. This script builds a small but REAL HuggingFace fast tokenizer
with umT5's special-token layout (pad=<pad> id 0, eos=</s> id 1,
unk=<unk> id 2, T5-style "append </s>" post-processing) so the
``HuggingfaceTokenizer`` wrapper's clean/pad/trim semantics
(ref wan/modules/tokenizers.py:37-82) run for real in tests.

Deterministic: a fixed corpus + WordLevel trainer → byte-identical
assets; re-run to regenerate.
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "assets",
                   "tiny_tokenizer")

CORPUS = [
    "a cinematic shot of a cat walking on the beach at sunset",
    "two anthropomorphic cats in boxing gear fight on a spotlighted stage",
    "a stylish woman walks down a tokyo street filled with neon signs",
    "drone view of waves crashing against the rugged cliffs of big sur",
    "the camera pans slowly across a misty mountain valley at dawn",
    "a golden retriever puppy plays in fresh powder snow in slow motion",
    "historical footage of california during the gold rush era",
    "an astronaut riding a horse in a photorealistic style",
    "close up of a chameleon changing colors on a branch",
    "time lapse of a busy city intersection at night with light trails",
    "underwater scene of a coral reef teeming with tropical fish",
    "a paper origami world where cranes fly over folded oceans",
]


def main():
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from tokenizers.trainers import WordLevelTrainer

    tok = Tokenizer(WordLevel(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    trainer = WordLevelTrainer(
        vocab_size=512, special_tokens=["<pad>", "</s>", "<unk>"])
    tok.train_from_iterator(CORPUS, trainer)
    eos_id = tok.token_to_id("</s>")
    tok.post_processor = TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", eos_id)])
    tok.enable_truncation(max_length=512)

    os.makedirs(OUT, exist_ok=True)
    tok.save(os.path.join(OUT, "tokenizer.json"))
    with open(os.path.join(OUT, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "pad_token": "<pad>",
            "eos_token": "</s>",
            "unk_token": "<unk>",
            "model_max_length": 512,
        }, f, indent=1)
    with open(os.path.join(OUT, "special_tokens_map.json"), "w") as f:
        json.dump({"pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>"}, f, indent=1)
    print(f"wrote {OUT} (vocab {tok.get_vocab_size()})")


if __name__ == "__main__":
    main()
