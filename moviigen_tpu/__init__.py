"""moviigen_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video framework.

A from-scratch rebuild of the capabilities of ZulutionAI/MoviiGen1.1 (a
cinematic fine-tune of Wan2.1 T2V-14B) designed for TPU hardware:

- ``models``     : WanModel DiT, 3D causal VAE, umT5 encoder, CLIP tower —
                   pure-functional JAX with stacked-layer ``lax.scan`` blocks.
- ``ops``        : attention (Pallas flash kernel + jnp reference), 3D RoPE,
                   norms, causal conv3d.
- ``diffusion``  : flow-matching samplers (UniPC, DPM-Solver++, Euler) as
                   precomputed coefficient tables + jittable linear updates.
- ``parallel``   : device mesh, sharding rules (FSDP-style param sharding),
                   Ulysses/ring sequence parallelism via shard_map collectives.
- ``pipelines``  : text→video generation pipeline.
- ``training``   : flow-matching fine-tune loop, data pipeline, checkpoints.

Reference behavior parity is documented per-module with ``file:line`` citations
into the upstream PyTorch repo (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"
