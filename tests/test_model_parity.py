"""Numerical parity of the JAX WanModel DiT against the reference PyTorch
model (loaded standalone on CPU with stubs) on random weights, fp32."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_loader
from moviigen_tpu.configs import WanModelConfig
from moviigen_tpu.models import wan_model
from moviigen_tpu.models.wan_convert import convert_wan_state_dict
from moviigen_tpu.ops.rope import rope_3d_freqs

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree not present")

CFG = WanModelConfig(
    model_type="t2v", patch_size=(1, 2, 2), text_len=16, in_dim=4,
    dim=64, ffn_dim=128, freq_dim=32, text_dim=24, out_dim=4,
    num_heads=4, num_layers=2, qk_norm=True, cross_attn_norm=True)


@pytest.fixture(scope="module")
def ref_and_params():
    import torch

    torch.manual_seed(0)
    ref = ref_loader.load_ref_model()
    model = ref.WanModel(
        model_type=CFG.model_type, patch_size=list(CFG.patch_size),
        text_len=CFG.text_len, in_dim=CFG.in_dim, dim=CFG.dim,
        ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim, text_dim=CFG.text_dim,
        out_dim=CFG.out_dim, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=CFG.qk_norm,
        cross_attn_norm=CFG.cross_attn_norm, eps=CFG.eps).eval().float()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = convert_wan_state_dict(sd, CFG, dtype=jnp.float32)
    return model, params


@pytest.mark.parametrize("fhw", [(3, 8, 8), (5, 4, 6)])
def test_forward_parity(ref_and_params, fhw):
    import torch

    model, params = ref_and_params
    f, h, w = fhw
    rng = np.random.default_rng(0)
    x = rng.standard_normal((CFG.in_dim, f, h, w)).astype(np.float32)
    ctx_len = 11
    ctx = rng.standard_normal((ctx_len, CFG.text_dim)).astype(np.float32)
    t_val = 500.0

    grid = (f // CFG.patch_size[0], h // CFG.patch_size[1],
            w // CFG.patch_size[2])
    seq_len = grid[0] * grid[1] * grid[2]

    with torch.no_grad():
        want = model(
            [torch.from_numpy(x)], t=torch.tensor([t_val]),
            context=[torch.from_numpy(ctx)], seq_len=seq_len)[0].numpy()

    # our fixed-shape interface: zero-pad context to text_len up front
    ctx_pad = np.zeros((1, CFG.text_len, CFG.text_dim), np.float32)
    ctx_pad[0, :ctx_len] = ctx
    rope = rope_3d_freqs(grid, CFG.head_dim)
    got = np.asarray(wan_model.forward(
        params, jnp.asarray(x[None]), jnp.asarray([t_val]),
        jnp.asarray(ctx_pad), CFG, rope, seq_len=seq_len,
        compute_dtype=jnp.float32, attn_backend="xla"))[0]

    assert got.shape == want.shape == (CFG.out_dim, f, h, w)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_forward_parity_padded_seq(ref_and_params):
    """seq_len > token count: zero-pad + k_lens masking path.

    The reference CPU fallback drops the key mask (attention.py:165-167),
    so compare against the reference at exact length but run ours padded —
    padding must not change the unpadded-token outputs."""
    import torch

    model, params = ref_and_params
    f, h, w = 3, 4, 4
    rng = np.random.default_rng(1)
    x = rng.standard_normal((CFG.in_dim, f, h, w)).astype(np.float32)
    ctx = rng.standard_normal((5, CFG.text_dim)).astype(np.float32)
    grid = (f, h // 2, w // 2)
    tokens = f * (h // 2) * (w // 2)
    seq_len = tokens + 10

    with torch.no_grad():
        want = model(
            [torch.from_numpy(x)], t=torch.tensor([250.0]),
            context=[torch.from_numpy(ctx)], seq_len=tokens)[0].numpy()

    ctx_pad = np.zeros((1, CFG.text_len, CFG.text_dim), np.float32)
    ctx_pad[0, :5] = ctx
    rope = rope_3d_freqs(grid, CFG.head_dim)
    got = np.asarray(wan_model.forward(
        params, jnp.asarray(x[None]), jnp.asarray([250.0]),
        jnp.asarray(ctx_pad), CFG, rope, seq_len=seq_len,
        compute_dtype=jnp.float32, attn_backend="xla"))[0]

    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_remat_matches(ref_and_params):
    """jax.checkpoint over blocks must not change outputs."""
    _, params = ref_and_params
    f, h, w = 3, 4, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, f, h, w)),
                    jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((1, CFG.text_len, CFG.text_dim)), jnp.float32)
    rope = rope_3d_freqs((f, h // 2, w // 2), CFG.head_dim)
    a = wan_model.forward(params, x, jnp.asarray([100.0]), ctx, CFG, rope,
                          compute_dtype=jnp.float32, attn_backend="xla")
    b = wan_model.forward(params, x, jnp.asarray([100.0]), ctx, CFG, rope,
                          compute_dtype=jnp.float32, attn_backend="xla",
                          remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_init_params_forward_runs_bf16():
    """Random init + bf16 compute path end-to-end."""
    params = wan_model.init_params(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((2, CFG.in_dim, 3, 8, 8))
    ctx = jnp.zeros((2, CFG.text_len, CFG.text_dim))
    rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
    out = wan_model.forward(params, x, jnp.asarray([0.0, 999.0]), ctx, CFG,
                            rope, attn_backend="xla")
    assert out.shape == (2, CFG.out_dim, 3, 8, 8)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_i2v_forward_parity():
    """i2v variant: CLIP-token cross-attention + y channel concat."""
    import torch

    i2v_cfg = CFG.replace(model_type="i2v", in_dim=8)
    torch.manual_seed(1)
    ref = ref_loader.load_ref_model()
    model = ref.WanModel(
        model_type="i2v", patch_size=list(i2v_cfg.patch_size),
        text_len=i2v_cfg.text_len, in_dim=i2v_cfg.in_dim,
        dim=i2v_cfg.dim, ffn_dim=i2v_cfg.ffn_dim,
        freq_dim=i2v_cfg.freq_dim, text_dim=i2v_cfg.text_dim,
        out_dim=i2v_cfg.out_dim, num_heads=i2v_cfg.num_heads,
        num_layers=i2v_cfg.num_layers, qk_norm=i2v_cfg.qk_norm,
        cross_attn_norm=i2v_cfg.cross_attn_norm,
        eps=i2v_cfg.eps).eval().float()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = convert_wan_state_dict(sd, i2v_cfg, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    f, h, w = 3, 4, 4
    x = rng.standard_normal((4, f, h, w)).astype(np.float32)
    y = rng.standard_normal((4, f, h, w)).astype(np.float32)
    ctx = rng.standard_normal((6, i2v_cfg.text_dim)).astype(np.float32)
    clip_fea = rng.standard_normal((1, 257, 1280)).astype(np.float32)
    grid = (f, h // 2, w // 2)
    tokens = grid[0] * grid[1] * grid[2]

    with torch.no_grad():
        want = model(
            [torch.from_numpy(x)], t=torch.tensor([333.0]),
            context=[torch.from_numpy(ctx)], seq_len=tokens,
            clip_fea=torch.from_numpy(clip_fea),
            y=[torch.from_numpy(y)])[0].numpy()

    ctx_pad = np.zeros((1, i2v_cfg.text_len, i2v_cfg.text_dim), np.float32)
    ctx_pad[0, :6] = ctx
    rope = rope_3d_freqs(grid, i2v_cfg.head_dim)
    got = np.asarray(wan_model.forward(
        params, jnp.asarray(x[None]), jnp.asarray([333.0]),
        jnp.asarray(ctx_pad), i2v_cfg, rope,
        compute_dtype=jnp.float32, attn_backend="xla",
        clip_fea=jnp.asarray(clip_fea), y=jnp.asarray(y[None])))[0]

    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_ffn_chunking_invariance():
    """cfg.ffn_chunk streams tokens through the FFN; the FFN has no
    cross-token coupling so outputs must match the unchunked forward."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    # chunk 12 does not divide the 32 tokens → also exercises padding
    cfg_c = dataclasses.replace(cfg, ffn_chunk=12)
    out = wan_model.forward(params, x, t, ctx, cfg_c, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_convert_as_numpy_matches_device(ref_and_params):
    """Host-side (as_numpy) conversion builds the identical tree — the
    staging path that lets the 28 GB 14B tree be quantized before any
    device residence."""
    model, params = ref_and_params
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    host = convert_wan_state_dict(sd, CFG, dtype=jnp.float32,
                                  as_numpy=True)
    flat_d, tree_d = jax.tree_util.tree_flatten(params)
    flat_h, tree_h = jax.tree_util.tree_flatten(host)
    assert tree_d == tree_h
    for a, b in zip(flat_d, flat_h):
        assert isinstance(b, np.ndarray)
        np.testing.assert_array_equal(np.asarray(a), b)


def test_attn_head_chunking_invariance():
    """cfg.attn_head_chunk runs self-attention in head groups with a
    two-pass full-dim qk-norm statistic; outputs must match the
    unchunked forward up to fp32 summation order (the long-sequence
    single-chip HBM knob, like ffn_chunk)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    assert cfg.num_heads % 2 == 0
    params = wan_model.init_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([321.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    cfg_c = dataclasses.replace(cfg, attn_head_chunk=cfg.num_heads // 2)
    out = wan_model.forward(params, x, t, ctx, cfg_c, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_attn_head_chunking_quantized_runs():
    """Head chunking must compose with quantized leaves (the serving
    combination at 131k tokens: int4 weights + head groups) — the
    column slicer handles q4/q8/scale formats."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.quantization import quantize_wan_params
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(2), cfg,
                                   dtype=jnp.float32)
    qparams = quantize_wan_params(params, bits=4)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([77.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(qparams, x, t, ctx, cfg, rope,
                            attn_backend="xla")
    cfg_c = dataclasses.replace(cfg, attn_head_chunk=cfg.num_heads // 2)
    out = wan_model.forward(qparams, x, t, ctx, cfg_c, rope,
                            attn_backend="xla")
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_cross_attn_chunking_invariance():
    """cfg.cross_attn_chunk streams query tokens through cross-attention
    (text kv only, no cross-query coupling) — outputs must match the
    unchunked forward exactly, including a chunk that does not divide
    the token count."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([60.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    cfg_c = dataclasses.replace(cfg, cross_attn_chunk=12)  # 32 % 12 != 0
    out = wan_model.forward(params, x, t, ctx, cfg_c, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_i2v_chunking_invariance():
    """attn_head_chunk + cross_attn_chunk on the i2v variant (dual
    text/image kv cross-attention streams queries through the same
    _token_stream) must match the unchunked i2v forward."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = CFG.replace(model_type="i2v", in_dim=8)
    params = wan_model.init_params(jax.random.PRNGKey(4), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(9)
    f, h, w = 3, 4, 4
    x = jnp.asarray(rng.standard_normal((1, 4, f, h, w)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 4, f, h, w)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    clip_fea = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)
    rope = rope_3d_freqs((f, h // 2, w // 2), cfg.head_dim)
    kw = dict(compute_dtype=jnp.float32, attn_backend="xla",
              clip_fea=clip_fea, y=y)
    ref = wan_model.forward(params, x, jnp.asarray([123.0]), ctx, cfg,
                            rope, **kw)
    cfg_c = dataclasses.replace(cfg, attn_head_chunk=cfg.num_heads // 2,
                                cross_attn_chunk=12)
    out = wan_model.forward(params, x, jnp.asarray([123.0]), ctx, cfg_c,
                            rope, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fully_streamed_stages_invariance():
    """The flagship long-sequence serving combination — attn_head_chunk
    + cross_attn_chunk + ffn_chunk all set — routes every stage through
    the in-place residual streams (_stream_residual: streamed
    o-projection row-slices, streamed cross-attention, streamed FFN,
    streamed head). Must match the unchunked forward up to fp32
    summation order."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([321.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    # 32 tokens; chunk=12 does not divide -> _divisor_chunk picks 8
    cfg_c = dataclasses.replace(cfg, attn_head_chunk=cfg.num_heads // 2,
                                cross_attn_chunk=12, ffn_chunk=12)
    out = wan_model.forward(params, x, t, ctx, cfg_c, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # attn_o_stream=False: head-chunked accumulator + whole o-projection
    # (the bisect fallback for the streamed-o path) — same math
    cfg_a = dataclasses.replace(cfg_c, attn_o_stream=False)
    outa = wan_model.forward(params, x, t, ctx, cfg_a, rope,
                             compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(outa), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # bf16 residual stream composes with the streamed stages
    outb = wan_model.forward(params, x, t, ctx, cfg_c, rope,
                             compute_dtype=jnp.float32,
                             attn_backend="xla",
                             residual_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(ref),
                               atol=0.12, rtol=0.05)
    # attn_o_chunk: token-chunked streamed-o residual updates (the
    # explicit opt-in since the whole-L DUS-free form became the
    # default) — same math as both forms above
    cfg_o = dataclasses.replace(cfg_c, attn_o_chunk=12)
    outo = wan_model.forward(params, x, t, ctx, cfg_o, rope,
                             compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(outo), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_divisor_chunk_is_true_divisor():
    """_divisor_chunk must return an exact divisor of l for every input:
    _stream_residual would silently skip tail-token updates and
    _chunked_delta_scan's reshape would fail otherwise (e.g. l=10,
    chunk=4 used to yield 3)."""
    from moviigen_tpu.models.wan_model import _divisor_chunk

    for l in (10, 32, 7, 97, 32760, 75600, 131040, 16):
        for chunk in (4, 12, 8192, 16384, 1):
            c = _divisor_chunk(l, chunk)
            assert l % c == 0, (l, chunk, c)
            assert c <= max(chunk, 1) or c == l, (l, chunk, c)
    assert _divisor_chunk(10, 4) == 2
    # near-prime l: tiny divisors are rejected, falls back to l
    assert _divisor_chunk(97, 16384) == 97
    assert _divisor_chunk(131040, 16384) == 16380


def test_chunked_delta_scan_non_divisor_chunk():
    """_chunked_delta_scan with a chunk that doesn't divide l (the
    ADVICE r3 medium: reshape used to fail at trace time)."""
    import jax.numpy as jnp

    from moviigen_tpu.models.wan_model import _chunked_delta_scan

    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = _chunked_delta_scan(x, 4, lambda xc: 2.0 * xc)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(x))


def test_stream_impl_unroll_matches_fori():
    """cfg.stream_impl='unroll' (python loops + static slices — the
    crash-workaround form of the streamed paths) must match the fori
    implementation and the unstreamed forward exactly."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(2), cfg,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([123.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    streams = dict(attn_head_chunk=cfg.num_heads // 2,
                   cross_attn_chunk=12, ffn_chunk=12)
    out_f = wan_model.forward(
        params, x, t, ctx,
        dataclasses.replace(cfg, stream_impl="fori", **streams),
        rope, compute_dtype=jnp.float32, attn_backend="xla")
    out_u = wan_model.forward(
        params, x, t, ctx,
        dataclasses.replace(cfg, stream_impl="unroll", **streams),
        rope, compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_f))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
