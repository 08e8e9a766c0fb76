"""Training subsystem tests: data layer, samplers, finetune CLI loop,
checkpointing, LoRA."""

import json
import os

import numpy as np
import pytest

from moviigen_tpu.training.data import (
    AspectRatioLengthBucketSampler, DataLoader, LatentDataset,
    SPAwareAspectRatioLengthBucketDistributedSampler,
    latent_collate_function)


@pytest.fixture()
def tiny_dataset(tmp_path):
    """Synthetic latent cache matching the reference layout."""
    d = tmp_path / "ds"
    (d / "latent").mkdir(parents=True)
    (d / "prompt_embed").mkdir()
    annos = []
    rng = np.random.default_rng(0)
    for i in range(12):
        lat = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
        np.save(d / "latent" / f"v{i}.npy", lat)
        emb = rng.standard_normal((5 + i % 3, 32)).astype(np.float32)
        np.save(d / "prompt_embed" / f"v{i}.npy", emb)
        annos.append({
            "latent_path": f"v{i}.npy",
            "prompt_embed_path": f"v{i}.npy",
            "length": 3,
            "aspect_ratio_bin": i % 2,
        })
    json_path = d / "videos2caption.json"
    json_path.write_text(json.dumps(annos))
    return str(json_path)


def test_latent_dataset_and_collate(tiny_dataset):
    ds = LatentDataset(tiny_dataset, num_latent_t=2, txt_max_len=16,
                       text_dim=32)
    assert len(ds) == 12
    lat, emb, mask = ds[0]
    assert lat.shape == (4, 2, 8, 8)       # trimmed to last 2 frames
    assert emb.shape == (16, 32)           # padded to txt_max_len
    assert mask.sum() == 5                 # true length preserved

    latents, embeds, lat_mask, emb_mask = latent_collate_function(
        [ds[0], ds[1], ds[2]])
    assert latents.shape == (3, 4, 2, 8, 8)
    assert lat_mask.shape == (3, 2, 8, 8)
    assert emb_mask.shape == (3, 16)


def test_bucket_sampler_batches_share_bucket():
    lengths = [10, 10, 50, 50, 10, 50, 10, 50, 10, 10, 50, 50]
    ars = [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1]
    s = AspectRatioLengthBucketSampler(
        batch_size=2, dataset_size=12, rank=0, world_size=1,
        lengths=lengths, aspect_ratios=ars, num_length_bins=2)
    idxs = list(s)
    assert len(idxs) % 2 == 0
    # every consecutive pair must come from the same (ar, length) bucket
    for i in range(0, len(idxs), 2):
        a, b = idxs[i], idxs[i + 1]
        assert ars[a] == ars[b]
        assert (lengths[a] >= 50) == (lengths[b] >= 50)


def test_sp_aware_sampler_identical_within_group():
    lengths = list(range(16))
    ars = [0] * 16
    outs = []
    for rank in range(4):
        s = SPAwareAspectRatioLengthBucketDistributedSampler(
            batch_size=1, dataset_size=16, rank=rank, world_size=4,
            sp_size=2, lengths=lengths, aspect_ratios=ars)
        outs.append(list(s))
    # ranks 0,1 share an SP group; ranks 2,3 share another
    assert outs[0] == outs[1]
    assert outs[2] == outs[3]
    assert outs[0] != outs[2]


def test_finetune_cli_end_to_end(tiny_dataset, tmp_path):
    """Drive the full finetune CLI: 4 steps + checkpoint + resume."""
    from moviigen_tpu.cli.finetune import main

    out = tmp_path / "out"
    argv = [
        "--task", "t2v-tiny",
        "--data_json_path", tiny_dataset,
        "--num_latent_t", "2",
        "--output_dir", str(out),
        "--train_batch_size", "2",
        "--max_train_steps", "4",
        "--checkpointing_steps", "2",
        "--learning_rate", "1e-4",
    ]
    main(argv)
    from moviigen_tpu.training.checkpoint import latest_checkpoint

    found = latest_checkpoint(str(out))
    assert found is not None and found[1] == 4

    # resume continues from step 4 → immediately saves final at 4
    main(argv + ["--resume_from_checkpoint", "latest"])


def test_finetune_cli_lora(tiny_dataset, tmp_path):
    from moviigen_tpu.cli.finetune import main

    out = tmp_path / "out_lora"
    main([
        "--task", "t2v-tiny",
        "--data_json_path", tiny_dataset,
        "--num_latent_t", "2",
        "--output_dir", str(out),
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "100",
        "--use_lora", "--lora_rank", "4", "--lora_alpha", "4",
        "--learning_rate", "1e-3",
    ])
    from moviigen_tpu.training.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(out))[1] == 2


def test_lora_merge_changes_only_targets():
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.training.lora import init_lora_params, merge_lora

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=2)
    merged = merge_lora(params, lora, alpha=2.0, rank=2)
    # B init to zero → merge is identity initially
    a = np.asarray(params["blocks"]["self_attn"]["q"]["kernel"])
    b = np.asarray(merged["blocks"]["self_attn"]["q"]["kernel"])
    np.testing.assert_array_equal(a, b)

    # nonzero B changes targets but not the FFN
    lora2 = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged2 = merge_lora(params, lora2, alpha=2.0, rank=2)
    assert np.abs(np.asarray(
        merged2["blocks"]["self_attn"]["q"]["kernel"]) - a).max() > 0
    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["ffn"]["fc1"]["kernel"]),
        np.asarray(merged2["blocks"]["ffn"]["fc1"]["kernel"]))


def test_attach_lora_matches_merge_forward():
    """The rank-r side path (attach_lora + wan_model._lora_side) is the
    same math as the merged kernel: fp32 forward outputs agree."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.training.lora import (attach_lora, init_lora_params,
                                            merge_lora)

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    # init_params zero-inits the head kernel (DiT final-layer init) —
    # randomize it so block deltas reach the output
    params["head"]["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["head"]["kernel"].shape,
        jnp.float32)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=2)
    # nonzero B so the delta actually contributes
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    t = jnp.asarray([500.0])
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)

    merged = np.asarray(wan_model.forward(
        merge_lora(params, lora, alpha=4.0, rank=2), x, t, ctx, cfg, rope))
    attached = np.asarray(wan_model.forward(
        attach_lora(params, lora, alpha=4.0, rank=2), x, t, ctx, cfg, rope))
    base = np.asarray(wan_model.forward(params, x, t, ctx, cfg, rope))
    # the blocks compute in bf16, so x@(W+AB) vs x@W + (x@A)@B differ at
    # bf16 rounding; the forms must agree far below the LoRA effect size
    form_diff = np.abs(attached - merged).max()
    lora_effect = np.abs(attached - base).max()
    assert lora_effect > 10 * form_diff, (lora_effect, form_diff)
    np.testing.assert_allclose(attached, merged, atol=1e-2, rtol=0.05)


@pytest.mark.parametrize("bits", [4, 8])
def test_qlora_train_step_quantized_base(bits):
    """QLoRA: train step over an int4/int8-packed frozen base — only
    A/B update, the packed base stays byte-identical, loss decreases."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.quantization import quantize_wan_params
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.training import TrainConfig, make_train_step
    from moviigen_tpu.training.lora import init_lora_params

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    # zero head kernel (DiT init) would block all gradient flow to the
    # LoRA targets — randomize it as a loaded checkpoint would be
    params["head"]["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["head"]["kernel"].shape,
        jnp.float32)
    frozen = jax.tree_util.tree_map(
        jnp.asarray, quantize_wan_params(params, bits=bits))
    lora = init_lora_params(jax.random.PRNGKey(1), frozen, rank=2)

    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    tc = TrainConfig(learning_rate=1e-2, remat=True, weighting_scheme="uniform")
    step = make_train_step(cfg, tc, rope, attn_backend="auto",
                           lora_alpha=2.0, lora_rank=2)
    jit_step = jax.jit(step, donate_argnums=(0, 1))

    from moviigen_tpu.training.train_step import make_optimizer
    opt_state = make_optimizer(tc).init(lora)

    rng = np.random.default_rng(5)
    batch = {
        "latents": jnp.asarray(
            rng.standard_normal((1, cfg.in_dim, 2, 8, 8)), jnp.float32),
        "context": jnp.asarray(
            rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
            jnp.float32),
    }
    frozen_before = jax.tree_util.tree_map(np.asarray, frozen)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(4):
        # fixed key: same noise/timestep draw each step isolates the
        # adapters' learning signal
        lora, opt_state, metrics = jit_step(lora, opt_state, batch, key,
                                            frozen)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm"]) > 0  # adapters get gradients
    assert losses[-1] < losses[0]
    # the packed base never changed
    qkey = "q4" if bits == 4 else "q8"
    np.testing.assert_array_equal(
        frozen_before["blocks"]["self_attn"]["q"][qkey],
        np.asarray(frozen["blocks"]["self_attn"]["q"][qkey]))


def test_qlora_train_step_sequence_parallel():
    """QLoRA over a (data=1, seq=2) mesh: the int4 frozen base shards
    FSDP-style (packed-byte gathers), the adapters replicate, and the
    sequence-parallel train step converges — the sp deployment of
    14B 480P-81f adapter training (single chip misses 15.75 GB by
    ~0.3 GB; docs/performance.md)."""
    import jax
    import jax.numpy as jnp

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.quantization import quantize_wan_params
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.parallel.mesh import make_pod_mesh
    from moviigen_tpu.parallel.sharding import dit_param_specs, shard_params
    from moviigen_tpu.training import TrainConfig, make_train_step
    from moviigen_tpu.training.lora import init_lora_params
    from moviigen_tpu.training.train_step import make_optimizer

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    params["head"]["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["head"]["kernel"].shape,
        jnp.float32)
    frozen = jax.tree_util.tree_map(
        jnp.asarray, quantize_wan_params(params, bits=4))
    lora = init_lora_params(jax.random.PRNGKey(1), frozen, rank=2)
    mesh = make_pod_mesh(data=1, seq=2)
    frozen = shard_params(mesh, frozen, dit_param_specs(frozen))

    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    tc = TrainConfig(learning_rate=1e-2, remat=True)
    step = jax.jit(make_train_step(cfg, tc, rope, attn_backend="auto",
                                   mesh=mesh, lora_rank=2, lora_alpha=2.0),
                   donate_argnums=(0, 1))
    opt_state = make_optimizer(tc).init(lora)
    rng = np.random.default_rng(5)
    batch = {
        "latents": jnp.asarray(
            rng.standard_normal((1, cfg.in_dim, 2, 8, 8)), jnp.float32),
        "context": jnp.asarray(
            rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
            jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        lora, opt_state, m = step(lora, opt_state, batch, key, frozen)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_lora_peft_safetensors_roundtrip(tmp_path):
    """peft-layout adapter export (ref save_lora_checkpoint parity):
    stacked A/B → torch-layout safetensors → stacked A/B, bit-exact."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.training.checkpoint import (
        export_lora_safetensors, lora_from_peft_state_dict,
        lora_to_peft_state_dict)
    from moviigen_tpu.training.lora import init_lora_params

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=3)
    lora = jax.tree_util.tree_map(
        lambda x: x + jax.random.normal(jax.random.PRNGKey(2), x.shape),
        lora)

    sd = lora_to_peft_state_dict(lora)
    # peft torch layout: lora_A.weight [r, d_in], lora_B.weight [d_out, r]
    a0 = sd["blocks.0.self_attn.q.lora_A.weight"]
    assert a0.shape == (3, cfg.dim)
    assert sd["blocks.1.self_attn.q.lora_B.weight"].shape == (cfg.dim, 3)
    back = lora_from_peft_state_dict(sd)
    assert set(back) == set(lora)
    for base in lora:
        np.testing.assert_array_equal(np.asarray(lora[base]["A"],
                                                 np.float32),
                                      back[base]["A"])
        np.testing.assert_array_equal(np.asarray(lora[base]["B"],
                                                 np.float32),
                                      back[base]["B"])

    # file roundtrip + adapter_config
    import json as _json

    from safetensors.numpy import load_file

    path = str(tmp_path / "lora_adapter.safetensors")
    export_lora_safetensors(path, lora, alpha=6.0, rank=3)
    assert set(load_file(path)) == set(sd)
    with open(tmp_path / "adapter_config.json") as f:
        meta = _json.load(f)
    assert meta["r"] == 3 and meta["lora_alpha"] == 6.0
    assert "self_attn/q" in meta["target_modules"]


def test_finetune_cli_qlora(tiny_dataset, tmp_path):
    from moviigen_tpu.cli.finetune import main

    out = tmp_path / "out_qlora"
    main([
        "--task", "t2v-tiny",
        "--data_json_path", tiny_dataset,
        "--num_latent_t", "2",
        "--output_dir", str(out),
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "100",
        "--use_lora", "--lora_rank", "4", "--lora_alpha", "4",
        "--quant", "int4",
        "--learning_rate", "1e-3",
    ])
    from moviigen_tpu.training.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(out))[1] == 2


class TestOptimalTransport:
    """Working equivalent of the reference's broken cosine OT pairing
    (scripts/train/util/math_util.py:8-29, finetune.py:206-208)."""

    def test_matches_scipy_hungarian(self):
        import jax.numpy as jnp
        from scipy.optimize import linear_sum_assignment

        from moviigen_tpu.training.ot import cosine_cost, linear_assignment

        rng = np.random.default_rng(1)
        for n in (2, 3, 5, 8):
            x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
            y = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
            cost = cosine_cost(x, y)
            got = np.asarray(linear_assignment(cost))
            want = linear_sum_assignment(np.asarray(cost))[1]
            c = np.asarray(cost)
            # optimal cost must match (ties may permute indices)
            assert np.isclose(c[np.arange(n), got].sum(),
                              c[np.arange(n), want].sum(), atol=1e-6)
            assert sorted(got) == list(range(n))  # a permutation

    def test_host_fallback_large_batch(self):
        import jax.numpy as jnp

        from moviigen_tpu.training.ot import (
            BRUTE_FORCE_MAX, cosine_optimal_transport)

        rng = np.random.default_rng(2)
        n = BRUTE_FORCE_MAX + 4
        x = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
        _, col = cosine_optimal_transport(x, y)
        assert sorted(np.asarray(col)) == list(range(n))

    def test_pairing_under_jit_reduces_cost(self):
        import jax
        import jax.numpy as jnp

        from moviigen_tpu.training.ot import cosine_cost, ot_pair_noise

        rng = np.random.default_rng(3)
        lat = jnp.asarray(rng.standard_normal((6, 4, 2, 4, 4)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal(lat.shape), jnp.float32)
        paired = jax.jit(ot_pair_noise)(lat, noise)
        c = np.asarray(cosine_cost(lat, noise))
        base = np.trace(c)
        got = np.trace(np.asarray(cosine_cost(lat, paired)))
        assert got <= base + 1e-6
        # marginal preserved: same rows, reordered
        assert np.allclose(np.sort(np.asarray(noise).reshape(6, -1), axis=0),
                           np.sort(np.asarray(paired).reshape(6, -1), axis=0))

    def test_finetune_cli_compute_ot(self, tiny_dataset, tmp_path):
        from moviigen_tpu.cli.finetune import main

        out = tmp_path / "out_ot"
        main([
            "--task", "t2v-tiny",
            "--data_json_path", tiny_dataset,
            "--num_latent_t", "2",
            "--output_dir", str(out),
            "--train_batch_size", "2",
            "--max_train_steps", "2",
            "--checkpointing_steps", "100",
            "--compute_ot",
        ])
        from moviigen_tpu.training.checkpoint import latest_checkpoint

        assert latest_checkpoint(str(out))[1] == 2


def test_grad_accum_cycle_updates_once():
    """TrainConfig.grad_accum_steps=2 (optax.MultiSteps — reference
    finetune.py:535-597): params hold bit-still after microbatch 1 and
    apply the averaged update at microbatch 2."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.training import (TrainConfig, init_train_state,
                                       make_train_step)

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    grid = (2, 4, 4)
    rope = rope_3d_freqs(grid, cfg.head_dim)
    tc = TrainConfig(remat=False, grad_accum_steps=2, learning_rate=1e-3)
    step = make_train_step(cfg, tc, rope, attn_backend="xla")
    _, opt_state = init_train_state(params, tc)
    batch = {
        "latents": jnp.ones((1, cfg.in_dim, 2, 8, 8), jnp.float32),
        "context": jnp.ones((1, cfg.text_len, cfg.text_dim), jnp.float32),
    }
    before = jax.tree_util.tree_map(np.asarray, params)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params, opt_state, m1 = step(params, opt_state, batch, k1)
    mid = jax.tree_util.tree_map(np.asarray, params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(mid)):
        np.testing.assert_array_equal(a, b)
    params, opt_state, m2 = step(params, opt_state, batch, k2)
    moved = any(
        np.any(a != np.asarray(b)) for a, b in
        zip(jax.tree_util.tree_leaves(mid),
            jax.tree_util.tree_leaves(params)))
    assert moved
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_bf16_residual_train_step_matches_fp32():
    """TrainConfig.residual_dtype='bfloat16' (the reference's autocast
    training numerics, finetune.py:244-248 — and what fits 32,760-token
    remat carries on a 16 GB chip): loss/grads track the fp32-residual
    step closely on identical inputs."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.training import (TrainConfig, init_train_state,
                                       make_train_step)

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
    grid = (2, 4, 4)
    rope = rope_3d_freqs(grid, cfg.head_dim)
    rng = np.random.default_rng(7)
    batch = {
        "latents": jnp.asarray(rng.standard_normal(
            (1, cfg.in_dim, 2, 8, 8)), jnp.float32),
        "context": jnp.asarray(rng.standard_normal(
            (1, cfg.text_len, cfg.text_dim)), jnp.bfloat16),
    }
    key = jax.random.PRNGKey(11)
    out = {}
    for rdt in ("float32", "bfloat16"):
        tc = TrainConfig(remat=True, residual_dtype=rdt)
        step = make_train_step(cfg, tc, rope, attn_backend="xla")
        _, opt_state = init_train_state(params, tc)
        _, _, m = step(params, opt_state, batch, key)
        out[rdt] = (float(m["loss"]), float(m["grad_norm"]))
        assert np.isfinite(out[rdt][0]) and np.isfinite(out[rdt][1])
    assert out["bfloat16"][0] == pytest.approx(out["float32"][0],
                                               rel=2e-2)
    assert out["bfloat16"][1] == pytest.approx(out["float32"][1],
                                               rel=5e-2)


def test_remat_group_grads_match_per_layer():
    """run_blocks(remat_group=g) checkpoints every g-th residual — the
    carry stack shrinks /g (the 32,760-token enabler on 16 GB) with
    grads identical to per-layer remat."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    assert cfg.num_layers % 2 == 0
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    grid = (2, 4, 4)
    rope = rope_3d_freqs(grid, cfg.head_dim)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)

    def loss(p, g):
        out = wan_model.forward(p, x, t, ctx, cfg, rope,
                                compute_dtype=jnp.float32,
                                attn_backend="xla", remat=True,
                                remat_group=g)
        return jnp.sum(jnp.square(out))

    l1, g1 = jax.value_and_grad(loss)(params, 1)
    l2, g2 = jax.value_and_grad(loss)(params, 2)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        wan_model.forward(params, x, t, ctx, cfg, rope, remat=True,
                          remat_group=cfg.num_layers + 1)


def test_ffn_bwd_chunk_grads_match_unchunked():
    """cfg.ffn_bwd_chunk (AD-friendly scanned FFN chunks with per-chunk
    checkpoint — the 75,600-token training enabler) leaves forward and
    gradients bit-identical to the unchunked FFN."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    cfg_c = dataclasses.replace(cfg, ffn_bwd_chunk=8)
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)

    def loss(p, c):
        out = wan_model.forward(p, x, t, ctx, c, rope,
                                compute_dtype=jnp.float32,
                                attn_backend="xla", remat=True)
        return jnp.sum(jnp.square(out))

    l1, g1 = jax.value_and_grad(loss)(params, cfg)
    l2, g2 = jax.value_and_grad(loss)(params, cfg_c)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attn_bwd_chunk_grads_match_unchunked():
    """cfg.attn_bwd_chunk (q-chunked self-attention with per-chunk
    checkpoint — bounding the attention-backward working set, VERDICT
    r3 item 5) leaves the forward bit-identical and gradients equal up
    to fp32 accumulation order of the k/v weight grads."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    cfg_c = dataclasses.replace(cfg, attn_bwd_chunk=12)  # 32 tok -> c=8
    params = wan_model.init_params(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)

    def loss(p, c):
        out = wan_model.forward(p, x, t, ctx, c, rope,
                                compute_dtype=jnp.float32,
                                attn_backend="xla", remat=True)
        return jnp.sum(jnp.square(out))

    l1, g1 = jax.value_and_grad(loss)(params, cfg)
    l2, g2 = jax.value_and_grad(loss)(params, cfg_c)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_attn_bwd_chunk_grads_batch2():
    """B=2 exercises _self_attention_bwd_chunked's batched transpose
    branch (the B>1 layout path lost coverage when the B=1 tests became
    the only users — ADVICE r4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    cfg_c = dataclasses.replace(cfg, attn_bwd_chunk=8)
    params = wan_model.init_params(jax.random.PRNGKey(5), cfg,
                                   dtype=jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([500.0, 200.0], jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((2, cfg.text_len, cfg.text_dim)), jnp.float32)

    def loss(p, c):
        out = wan_model.forward(p, x, t, ctx, c, rope,
                                compute_dtype=jnp.float32,
                                attn_backend="xla", remat=True)
        return jnp.sum(jnp.square(out))

    l1, g1 = jax.value_and_grad(loss)(params, cfg)
    l2, g2 = jax.value_and_grad(loss)(params, cfg_c)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_attn_bwd_chunk_padded_seq_len():
    """attn_bwd_chunk with a padded sequence (seq_len > tokens): the
    pad positions pass through RoPE unrotated (identity rows of the
    full-width tables) and k_lens masks them — must match the
    unchunked padded forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs

    cfg = WAN_CONFIGS["t2v-tiny"].model
    cfg_c = dataclasses.replace(cfg, attn_bwd_chunk=16)
    params = wan_model.init_params(jax.random.PRNGKey(4), cfg,
                                   dtype=jnp.float32)
    rope = rope_3d_freqs((2, 4, 4), cfg.head_dim)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                    jnp.float32)
    t = jnp.asarray([321.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    ref = wan_model.forward(params, x, t, ctx, cfg, rope, seq_len=40,
                            compute_dtype=jnp.float32, attn_backend="xla")
    out = wan_model.forward(params, x, t, ctx, cfg_c, rope, seq_len=40,
                            compute_dtype=jnp.float32, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
