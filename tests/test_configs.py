"""WanModelConfig memory-knob validation (VERDICT r4 item 9).

The nine interacting memory knobs have precedence rules implemented in
``wan_model.attention_block``; ``WanModelConfig.__post_init__`` is the
single point that rejects contradictory combinations instead of letting
one knob silently win. These tests enumerate the supported combos and
assert the errors.
"""

import pytest

from moviigen_tpu.configs import WAN_CONFIGS, WanModelConfig


BASE = WAN_CONFIGS["t2v-tiny"].model  # num_heads=4


SUPPORTED = [
    # the 131k serving config (whole-L streamed-o, DUS-free form)
    dict(attn_head_chunk=2, ffn_chunk=8, stream_impl="unroll"),
    # the r4 token-chunked streamed-o form (E10/E11 bisect rungs)
    dict(attn_head_chunk=2, cross_attn_chunk=8, attn_o_chunk=8,
         ffn_chunk=8, stream_impl="unroll"),
    # head-chunked accumulator + whole o-projection (bisect knob)
    dict(attn_head_chunk=2, attn_o_stream=False),
    # the training memory recipe (finetune CLI flags)
    dict(ffn_bwd_chunk=8, attn_bwd_chunk=8),
    # serving FFN stream alone (the 720P headline config)
    dict(ffn_chunk=8),
]


@pytest.mark.parametrize("kw", SUPPORTED,
                         ids=lambda kw: "+".join(sorted(kw)))
def test_supported_knob_combos_construct(kw):
    cfg = BASE.replace(**kw)
    for k, val in kw.items():
        assert getattr(cfg, k) == val


REJECTED = [
    # attn_bwd_chunk silently ignored under the serving stream -> error
    (dict(attn_head_chunk=2, attn_bwd_chunk=8), "mutually exclusive"),
    # ffn_chunk would silently win over ffn_bwd_chunk -> error
    (dict(ffn_chunk=8, ffn_bwd_chunk=8), "mutually exclusive"),
    # attn_o_chunk is unreachable without the streamed-o path
    (dict(attn_o_chunk=8), "requires attn_head_chunk"),
    (dict(attn_head_chunk=2, attn_o_chunk=8, attn_o_stream=False),
     "requires attn_head_chunk"),
    # head chunk must divide num_heads (4 in the tiny config)
    (dict(attn_head_chunk=3), "must divide num_heads"),
    # positivity
    (dict(ffn_chunk=0), "must be positive"),
    (dict(cross_attn_chunk=-4), "must be positive"),
    # enums
    (dict(stream_impl="scan"), "stream_impl"),
    (dict(model_type="v2v"), "model_type"),
    (dict(cross_attn_backend="mosaic"), "cross_attn_backend"),
]


@pytest.mark.parametrize("kw,match", REJECTED,
                         ids=lambda p: "+".join(sorted(p))
                         if isinstance(p, dict) else p)
def test_contradictory_knob_combos_rejected(kw, match):
    with pytest.raises(ValueError, match=match):
        BASE.replace(**kw)


def test_registry_configs_all_valid():
    """Every registry entry re-validates through dataclasses.replace."""
    for name, pc in WAN_CONFIGS.items():
        assert pc.model.replace() == pc.model, name


def test_direct_construction_validates():
    with pytest.raises(ValueError, match="must divide num_heads"):
        WanModelConfig(num_heads=16, attn_head_chunk=5)


def test_cross_attn_backend_override_matches_default():
    """cross_attn_backend routes only the cross-attention sites; with
    an explicit 'xla' override (vs the default inherited backend, also
    xla on CPU) the forward is bit-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = BASE
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    t = jnp.asarray([250.0])
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    a = wan_model.forward(params, x, t, ctx, cfg, rope,
                          attn_backend="xla")
    b = wan_model.forward(params, x, t, ctx,
                          cfg.replace(cross_attn_backend="xla"), rope,
                          attn_backend="xla")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # chunked override changes the site's numerics only at fp tolerance
    c = wan_model.forward(params, x, t, ctx,
                          cfg.replace(cross_attn_backend="chunked"), rope,
                          attn_backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               atol=5e-3, rtol=5e-3)
