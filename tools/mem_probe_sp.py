"""AOT-compile the 14B flagship over an N-device virtual mesh and print
XLA's per-chip buffer-assignment memory — the compiled replacement for
the r3 arithmetic extrapolation (docs/performance.md "Scaling").

Two certifications (VERDICT r3 item 4):
  (a) sp=8 inference forward at 1920x832x81f (131,040 tokens), 14B dims;
  (b) sp=8 + FSDP training step at 1280x720x81f (75,600 tokens), 14B
      dims — the reference's own 720P training answer
      (scripts/train/finetune.sh:6-33, sp_size 8).

Under GSPMD the compiled module is per-device (one SPMD program), so
``compiled.memory_analysis()`` reports PER-CHIP temps/args — comparable
directly against the 16 GB v5e HBM budget.

Runs on a virtual CPU mesh (re-execs itself with JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count), so no TPU hardware is touched.

Usage:
    python tools/mem_probe_sp.py [--devices 8] [--which infer,train]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


DUMP_DIR = "/tmp/mem_probe_sp_dump"


def _respawn_on_cpu(argv, n_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices} "
        f"--xla_dump_to={DUMP_DIR} --xla_dump_hlo_as_text")
    # shrink the chunked-attention key block so the CPU-mesh logits
    # buffers ([B,N,Lq,bk] fp32) approximate the Pallas kernel's
    # VMEM-tile footprint instead of dominating the HBM picture
    env.setdefault("MOVIIGEN_CHUNKED_BLOCK_K", "128")
    import shutil

    shutil.rmtree(DUMP_DIR, ignore_errors=True)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *argv, "--impl"],
        env=env)
    sys.exit(proc.returncode)


def _cpu_upcast_artifacts(param_shapes, module_hint, specs=None,
                          n_devices=1):
    """Sum fp32 temp buffers in the XLA dump that are byte-for-byte
    fp32 copies of bf16 param leaves — XLA:CPU upcasts bf16 GEMM
    operands to fp32 and hoists the loop-invariant weight conversions
    out of the block scan, materializing fp32 copies of entire stacked
    weight shards. TPU's MXU consumes bf16 natively, so these buffers
    do not exist in the TPU program."""
    import glob
    import re

    import jax
    import numpy as np

    from jax.sharding import PartitionSpec as P

    files = [f for f in glob.glob(
        f"{DUMP_DIR}/*{module_hint}*buffer-assignment.txt")]
    if not files:
        return 0, 0
    leaves = jax.tree_util.tree_leaves(param_shapes)
    if specs is not None:
        spec_leaves = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda s: isinstance(s, P))
    else:
        spec_leaves = [None] * len(leaves)
    want = {}
    for leaf, spec in zip(leaves, spec_leaves):
        if str(leaf.dtype) != "bfloat16":
            continue
        shape = list(leaf.shape)
        if spec is not None:
            # per-chip sharded shape: divide dims on sharded axes
            for i, ax in enumerate(tuple(spec)):
                if ax is not None and i < len(shape):
                    shape[i] //= n_devices
        key = "f32[" + ",".join(str(d) for d in shape) + "]"
        want[key] = want.get(key, 0) + 1
    text = open(sorted(files)[-1]).read()
    temp_sec = text.split("preallocated-temp", 1)
    if len(temp_sec) < 2:
        return 0, 0
    total = 0
    count = 0
    seen = dict(want)
    for m in re.finditer(r"\(size=(\d+),offset=\d+\): (f32\[[\d,]*\])",
                         temp_sec[1]):
        size, shape = int(m.group(1)), m.group(2)
        if seen.get(shape, 0) > 0:
            seen[shape] -= 1
            total += size
            count += 1
    return total, count


def _mem_report(tag, compiled, param_shapes=None, module_hint="",
                specs=None, n_devices=1, budget_gb=15.75):
    ma = compiled.memory_analysis()
    if ma is None:
        print(f"[{tag}] memory_analysis unavailable on this backend")
        return None
    temp = getattr(ma, "temp_size_in_bytes", 0)
    arg = getattr(ma, "argument_size_in_bytes", 0)
    out = getattr(ma, "output_size_in_bytes", 0)
    alias = getattr(ma, "alias_size_in_bytes", 0)
    code = getattr(ma, "generated_code_size_in_bytes", 0)
    tot = temp + arg + out - alias
    upcast, n_upcast = (0, 0) if param_shapes is None else \
        _cpu_upcast_artifacts(param_shapes, module_hint,
                              specs=specs, n_devices=n_devices)
    adj = tot - upcast
    print(f"[{tag}] per-chip raw: temps {temp / 1e9:.3f} GB + "
          f"args {arg / 1e9:.3f} GB + out {out / 1e9:.3f} GB - "
          f"alias {alias / 1e9:.3f} GB = {tot / 1e9:.3f} GB "
          f"(code {code / 1e6:.1f} MB)", flush=True)
    if upcast:
        print(f"[{tag}]   minus {n_upcast} CPU-only fp32 weight-upcast "
              f"temps ({upcast / 1e9:.3f} GB; TPU MXU reads bf16 "
              f"directly) -> adjusted {adj / 1e9:.3f} GB", flush=True)
    print(f"[{tag}] per-chip {adj / 1e9:.3f} GB vs {budget_gb} GB "
          f"v5e budget: {'OK' if adj / 1e9 < budget_gb else 'OVER'} "
          f"(remaining CPU-probe conservatism: fp32 GEMM outputs where "
          f"TPU writes bf16)", flush=True)
    return {"tag": tag, "temp_gb": temp / 1e9, "arg_gb": arg / 1e9,
            "out_gb": out / 1e9, "alias_gb": alias / 1e9,
            "total_raw_gb": tot / 1e9,
            "cpu_upcast_artifact_gb": upcast / 1e9,
            "total_adjusted_gb": adj / 1e9,
            "fits_16gb_v5e": adj / 1e9 < budget_gb}


def probe_infer(n_devices, task="t2v-14B", size=(1920, 832), frames=81):
    """sp=N Ulysses inference forward at 14B dims: params FSDP-sharded
    at rest on the seq axis, activations token-sharded."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.parallel.mesh import make_mesh
    from moviigen_tpu.parallel.sharding import dit_param_specs
    from moviigen_tpu.parallel.ulysses import sequence_parallel_forward
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = WAN_CONFIGS[task].model
    w, h = size
    fp = (frames - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    mesh = make_mesh(data=1, seq=n_devices)
    print(f"[infer] {task} {w}x{h}x{frames}f tokens={tokens} "
          f"mesh={dict(mesh.shape)} (Ulysses SP + FSDP-at-rest)",
          flush=True)

    params_shapes = jax.eval_shape(
        lambda: wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                      dtype=jnp.bfloat16))
    specs = dit_param_specs(params_shapes, axis="seq")
    pshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P))
    rope = rope_3d_freqs(grid, cfg.head_dim)

    def fwd(params, x, t, c):
        return jnp.sum(sequence_parallel_forward(
            params, x, t, c, cfg, rope, mesh, seq_len=tokens,
            attn_backend="chunked", fsdp_params=True,
            residual_dtype=jnp.bfloat16).astype(jnp.float32))

    x = jax.ShapeDtypeStruct((1, cfg.in_dim, fp, h // 8, w // 8),
                             jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    c = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim),
                             jnp.bfloat16)
    t0 = time.time()
    lowered = jax.jit(fwd, in_shardings=(
        pshard, NamedSharding(mesh, P()), NamedSharding(mesh, P()),
        NamedSharding(mesh, P()))).lower(params_shapes, x, t, c)
    print(f"[infer] lowered in {time.time() - t0:.0f}s; compiling...",
          flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[infer] compiled in {time.time() - t0:.0f}s", flush=True)
    return _mem_report(f"infer sp={n_devices} {tokens}tok 14B bf16",
                       compiled, param_shapes=params_shapes,
                       module_hint="jit_fwd", specs=specs,
                       n_devices=n_devices)


def probe_train(n_devices, task="t2v-14B", size=(1280, 720), frames=81,
                remat_group=1, ffn_bwd_chunk=None, attn_bwd_chunk=None,
                ring=1):
    """sp=N + FSDP training step (loss+grads+clip+AdamW) at 14B dims
    with the r3 memory recipe (bf16 residuals, remat_group, chunked-FFN
    backward) — the reference's finetune.sh 720P operating point."""
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.parallel.mesh import make_mesh
    from moviigen_tpu.parallel.sharding import dit_param_specs
    from moviigen_tpu.training import TrainConfig, init_train_state, \
        make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    # default is per-layer remat only; at sp=8 the 14B 720P step needs
    # the r3 memory recipe on top (probed 33.6 GB/chip adjusted without
    # it): pass --remat_group/--ffn_bwd_chunk/--attn_bwd_chunk to
    # certify a fitting configuration. The nested-group scan-of-scan
    # costs compile RAM on this 1-core/125 GB XLA:CPU probe host.
    cfg = WAN_CONFIGS[task].model
    if ffn_bwd_chunk or attn_bwd_chunk:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, ffn_bwd_chunk=ffn_bwd_chunk,
                          attn_bwd_chunk=attn_bwd_chunk)
    w, h = size
    fp = (frames - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    # ring>1 → hybrid USP (ulysses heads x ring kv-rotation): the
    # scale-out past head-divisibility (40 heads caps pure Ulysses at
    # sp=8 with even groups); params/optimizer FSDP-shard over BOTH
    # sequence axes, so per-chip state halves vs sp=8.
    if ring > 1:
        assert n_devices % ring == 0
        mesh = make_mesh(data=1, ring=ring, seq=n_devices // ring)
        param_axis = ("ring", "seq")
    else:
        mesh = make_mesh(data=1, seq=n_devices)
        param_axis = "seq"
    print(f"[train] {task} {w}x{h}x{frames}f tokens={tokens} "
          f"mesh={dict(mesh.shape)} (Ulysses SP + FSDP + AdamW)",
          flush=True)

    tc = TrainConfig(remat=True, residual_dtype="bfloat16",
                 remat_group=remat_group)
    rope = rope_3d_freqs(grid, cfg.head_dim)
    # pad the sequence to an sp multiple (the SP-aware data path's
    # seq_len rounding; pad tokens are k_lens-masked) — 75,600 tokens
    # divide by sp=8/16 but not 32
    seq_len = -(-tokens // n_devices) * n_devices
    step = make_train_step(cfg, tc, rope, attn_backend="chunked",
                           mesh=mesh,
                           seq_len=None if seq_len == tokens else seq_len)

    from moviigen_tpu.parallel.sharding import opt_state_specs

    # bf16 master weights + bf16 AdamW moments — the reference's OWN
    # 14B/720P operating point (finetune.sh:8 --master_weight_type
    # bf16); fp32 state is 3x56 GB and cannot fit 8x16 GB at any
    # activation budget.
    params_shapes = jax.eval_shape(
        lambda: wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                      dtype=jnp.bfloat16))
    opt, _ = init_train_state(params_shapes, tc)
    opt_state_shapes = jax.eval_shape(opt.init, params_shapes)
    specs = dit_param_specs(params_shapes, axis=param_axis)
    as_sharding = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda s: NamedSharding(mesh, s), tree,
        is_leaf=lambda s: isinstance(s, P))
    pshard = as_sharding(specs)
    # fp32 adam moments mirror the param shardings (FSDP-sharded
    # optimizer state — replicated they'd be 2x56 GB/chip at 14B)
    oshard = as_sharding(
        opt_state_specs(opt_state_shapes, params_shapes, specs))

    batch = {
        "latents": jax.ShapeDtypeStruct(
            (1, cfg.in_dim, fp, h // 8, w // 8), jnp.float32),
        "context": jax.ShapeDtypeStruct(
            (1, cfg.text_len, cfg.text_dim), jnp.float32),
    }
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    t0 = time.time()
    with mesh:
        lowered = jax.jit(
            step, donate_argnums=(0, 1),
            in_shardings=(pshard, oshard, None, None)).lower(
            params_shapes, opt_state_shapes, batch, key)
    print(f"[train] lowered in {time.time() - t0:.0f}s; compiling...",
          flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[train] compiled in {time.time() - t0:.0f}s", flush=True)
    return _mem_report(f"train sp={n_devices} {tokens}tok 14B "
                       f"(bf16 master per finetune.sh, bf16 residuals, "
                       f"per-layer remat)", compiled,
                       param_shapes=params_shapes,
                       module_hint="jit_step", specs=specs,
                       n_devices=n_devices)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--which", default="infer,train")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--impl", action="store_true")
    ap.add_argument("--remat_group", type=int, default=1)
    ap.add_argument("--ffn_bwd_chunk", type=int, default=None)
    ap.add_argument("--attn_bwd_chunk", type=int, default=None)
    ap.add_argument("--ring", type=int, default=1,
                    help="ring degree for hybrid-USP train probe "
                         "(n_devices = ring x ulysses)")
    args = ap.parse_args()

    if not args.impl:
        argv = [a for a in sys.argv[1:]]
        _respawn_on_cpu(argv, args.devices)

    import jax

    assert len(jax.devices()) >= args.devices, (
        f"need {args.devices} devices, have {len(jax.devices())}")
    results = []
    if "infer" in args.which:
        results.append(probe_infer(args.devices))
    if "train" in args.which:
        results.append(probe_train(
            args.devices, remat_group=args.remat_group,
            ffn_bwd_chunk=args.ffn_bwd_chunk,
            attn_bwd_chunk=args.attn_bwd_chunk, ring=args.ring))
    results = [r for r in results if r]
    if args.json_out and results:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
