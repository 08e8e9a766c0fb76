"""Distributed-execution invariance tests on the 8-device virtual CPU mesh.

This is the structural upgrade over the reference's hand-checked
print-sum SP debugging (SURVEY §4.3): sharded forward must equal the
single-device forward bit-for-tolerance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.models import wan_model
from moviigen_tpu.ops.rope import rope_3d_freqs
from moviigen_tpu.parallel.mesh import make_mesh
from moviigen_tpu.parallel.sharding import dit_param_specs, shard_params
from moviigen_tpu.parallel.ulysses import sequence_parallel_forward

CFG = WAN_CONFIGS["t2v-tiny"].model


@pytest.fixture(scope="module")
def setup():
    params = wan_model.init_params(jax.random.PRNGKey(0), CFG,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, CFG.in_dim, 4, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0, 250.0], jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2, CFG.text_len, CFG.text_dim)), jnp.float32)
    rope = rope_3d_freqs((4, 4, 4), CFG.head_dim)
    ref = wan_model.forward(params, x, t, ctx, CFG, rope,
                            compute_dtype=jnp.float32, attn_backend="xla")
    return params, x, t, ctx, rope, ref


@pytest.mark.parametrize("data,seq", [(1, 4), (2, 4), (1, 2), (2, 1)])
def test_ulysses_sp_invariance(setup, data, seq):
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=data, seq=seq)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh,
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ulysses_sp_with_padded_seq(setup):
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=1, seq=4)
    # 64 tokens padded to 72 (multiple of 4) exercises k_lens masking +
    # identity-rope padding
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, seq_len=72,
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gspmd_param_sharding_invariance(setup):
    """TP-style param sharding (GSPMD) must not change the result."""
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=2, seq=4)
    specs = dit_param_specs(params, axis="seq")
    sharded = shard_params(mesh, params, specs)
    with mesh:
        xb = jax.device_put(x, NamedSharding(
            mesh, P("data", None, None, None, None)))
        out = jax.jit(lambda p, x: wan_model.forward(
            p, x, t, ctx, CFG, rope, compute_dtype=jnp.float32,
            attn_backend="xla"))(sharded, xb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ulysses_head_divisibility_assert(setup):
    params, x, t, ctx, rope, _ = setup
    mesh = make_mesh(data=1, seq=8)  # heads=4 < 8 → must raise
    with pytest.raises(AssertionError):
        sequence_parallel_forward(
            params, x, t, ctx, CFG, rope, mesh,
            compute_dtype=jnp.float32, attn_backend="xla")


@pytest.mark.parametrize("data,seq", [(1, 4), (2, 2)])
def test_ring_sp_invariance(setup, data, seq):
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=data, seq=seq)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, sp_mode="ring",
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_sp_with_padded_seq(setup):
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=1, seq=4)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, seq_len=72, sp_mode="ring",
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_allows_indivisible_heads(setup):
    """heads=4, sp=8: ulysses would assert, ring must work...
    but 64 tokens / 8 ranks needs seq_len multiple → use seq_len=64."""
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=1, seq=8)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, sp_mode="ring",
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("sp_mode", ["ulysses", "ring"])
def test_fsdp_params_inside_sp(setup, sp_mode):
    """FSDP at rest + just-in-time per-layer gather inside the SP
    shard_map must equal the single-device forward."""
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=2, seq=2)
    specs = dit_param_specs(params, axis="seq")
    sharded = shard_params(mesh, params, specs)
    out = sequence_parallel_forward(
        sharded, x, t, ctx, CFG, rope, mesh, sp_mode=sp_mode,
        fsdp_params=True, compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("data,ring,seq", [(2, 2, 2), (1, 4, 2), (1, 2, 4)])
def test_hybrid_usp_invariance(setup, data, ring, seq):
    """Hybrid Ulysses×Ring (ref --ulysses_size U --ring_size R, both >1)
    on a 3-axis mesh must equal the single-device forward."""
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=data, ring=ring, seq=seq)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, sp_mode="usp",
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_hybrid_usp_with_padded_seq(setup):
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=1, ring=2, seq=4)
    out = sequence_parallel_forward(
        params, x, t, ctx, CFG, rope, mesh, seq_len=72, sp_mode="usp",
        compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_hybrid_usp_fsdp_params(setup):
    """FSDP at rest over ring×seq jointly + JIT gathers inside the USP
    shard_map."""
    params, x, t, ctx, rope, ref = setup
    mesh = make_mesh(data=2, ring=2, seq=2)
    specs = dit_param_specs(params, axis=("ring", "seq"))
    sharded = shard_params(mesh, params, specs)
    out = sequence_parallel_forward(
        sharded, x, t, ctx, CFG, rope, mesh, sp_mode="usp",
        fsdp_params=True, compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_hybrid_usp_requires_ring_axis(setup):
    params, x, t, ctx, rope, _ = setup
    mesh = make_mesh(data=2, seq=4)
    with pytest.raises(AssertionError):
        sequence_parallel_forward(
            params, x, t, ctx, CFG, rope, mesh, sp_mode="usp",
            compute_dtype=jnp.float32, attn_backend="xla")


def test_pod_mesh_single_slice_fallback(setup):
    """CPU devices have no slice_index → make_pod_mesh == make_mesh."""
    from moviigen_tpu.parallel.mesh import make_pod_mesh

    mesh = make_pod_mesh(data=2, seq=4)
    assert dict(mesh.shape) == {"data": 2, "seq": 4}
    mesh = make_pod_mesh(data=2, ring=2, seq=2)
    assert dict(mesh.shape) == {"data": 2, "ring": 2, "seq": 2}


def test_pod_mesh_rejects_indivisible_data():
    from moviigen_tpu.parallel.mesh import make_pod_mesh

    with pytest.raises(ValueError):
        make_pod_mesh(data=3, seq=2, num_slices=2)


def test_train_step_hybrid_usp_mesh(setup):
    """One full training step (fwd+bwd+AdamW) over a (data, ring, seq)
    mesh: loss must match the single-device step on the same key."""
    from jax.sharding import NamedSharding
    from moviigen_tpu.training import (TrainConfig, init_train_state,
                                       make_train_step)

    params = wan_model.init_params(jax.random.PRNGKey(0), CFG,
                                   dtype=jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), CFG.head_dim)
    tc = TrainConfig(remat=True)
    batch = {
        "latents": jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, CFG.in_dim, 2, 8, 8)), jnp.float32),
        "context": jnp.asarray(np.random.default_rng(2).standard_normal(
            (2, CFG.text_len, CFG.text_dim)), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    step1 = make_train_step(CFG, tc, rope, attn_backend="xla")
    opt, opt_state = init_train_state(params, tc)
    _, _, m1 = jax.jit(step1)(params, opt_state, batch, key)

    mesh = make_mesh(data=2, ring=2, seq=2)
    stepN = make_train_step(CFG, tc, rope, attn_backend="xla", mesh=mesh)
    specs = dit_param_specs(params, axis=("ring", "seq"))
    sharded = shard_params(mesh, params, specs)
    opt2, opt_state2 = init_train_state(sharded, tc)
    with mesh:
        b2 = {
            "latents": jax.device_put(batch["latents"], NamedSharding(
                mesh, P("data", None, None, None, None))),
            "context": jax.device_put(batch["context"], NamedSharding(
                mesh, P("data", None, None))),
        }
        _, _, mN = jax.jit(stepN)(sharded, opt_state2, b2, key)
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=2e-2)
    assert np.isfinite(float(mN["grad_norm"]))


def test_pod_mesh_hybrid_branch_shapes(monkeypatch):
    """On a (faked) 2-slice fleet, make_pod_mesh must split the data axis
    across slices via create_hybrid_device_mesh."""
    from moviigen_tpu.parallel import mesh as mesh_mod

    calls = {}

    def fake_hybrid(mesh_shape, dcn_shape, devices=None):
        calls["mesh_shape"] = tuple(mesh_shape)
        calls["dcn_shape"] = tuple(dcn_shape)
        n = int(np.prod(mesh_shape)) * int(np.prod(dcn_shape))
        return np.asarray(jax.devices()[:n]).reshape(
            tuple(np.multiply(mesh_shape, dcn_shape)))

    import jax.experimental.mesh_utils as mu

    monkeypatch.setattr(mu, "create_hybrid_device_mesh", fake_hybrid)
    m = mesh_mod.make_pod_mesh(data=4, seq=2, num_slices=2)
    assert calls["mesh_shape"] == (2, 2) and calls["dcn_shape"] == (2, 1)
    assert dict(m.shape) == {"data": 4, "seq": 2}

    m = mesh_mod.make_pod_mesh(data=2, ring=2, seq=2, num_slices=2)
    assert calls["mesh_shape"] == (1, 2, 2)
    assert calls["dcn_shape"] == (2, 1, 1)
    assert dict(m.shape) == {"data": 2, "ring": 2, "seq": 2}


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_params_shard_and_fsdp(setup, bits):
    """Quantized (int8/int4) trees shard at rest over the mesh and
    FSDP-gather just-in-time inside SP — gathers move packed bytes.
    Must equal the same quantized tree on one device."""
    from moviigen_tpu.ops.quantization import quantize_wan_params

    params, x, t, ctx, rope, _ = setup
    qparams = quantize_wan_params(
        jax.tree_util.tree_map(np.asarray, params), bits=bits)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    qref = wan_model.forward(params=qparams, x=x, t=t, context=ctx,
                             cfg=CFG, rope=rope,
                             compute_dtype=jnp.float32,
                             attn_backend="xla")

    mesh = make_mesh(data=2, seq=2)
    specs = dit_param_specs(qparams, axis="seq")
    tag = "q4" if bits == 4 else "q8"
    assert specs["blocks"]["self_attn"]["q"][tag][-1] == "seq"
    assert specs["blocks"]["ffn"]["fc1"]["scale"][-1] == "seq"
    sharded = shard_params(mesh, qparams, specs)

    # GSPMD: jit with sharded params, replicated activations
    with mesh:
        out = jax.jit(lambda p, x: wan_model.forward(
            p, x, t, ctx, CFG, rope, compute_dtype=jnp.float32,
            attn_backend="xla"))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(qref),
                               atol=2e-5, rtol=1e-4)

    # SP + FSDP JIT gathers
    out = sequence_parallel_forward(
        sharded, x, t, ctx, CFG, rope, mesh,
        fsdp_params=True, compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(qref),
                               atol=2e-5, rtol=1e-4)
