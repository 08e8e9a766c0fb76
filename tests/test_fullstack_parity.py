"""Full-stack parity oracle: the reference `WanT2V.generate` denoise loop
(model + UniPC/DPM++ + CFG combine + VAE decode,
wan/text2video.py:114-271) run end-to-end on a tiny config against this
repo's pipeline with IDENTICAL converted weights, injected identical
noise and identical text context — the SURVEY §7.3 fidelity contract:
near-bit latents given the same noise, plus decoded-video PSNR.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import ref_loader
from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.models import vae as jvae
from moviigen_tpu.models.vae_convert import convert_vae_state_dict
from moviigen_tpu.models.wan_convert import convert_wan_state_dict
from moviigen_tpu.pipelines import WanT2V
from moviigen_tpu.utils.metrics import psnr

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree not present")

CONFIG = WAN_CONFIGS["t2v-tiny"]
SIZE = (64, 64)          # → latent (z=4, 2, 8, 8), 32 DiT tokens
FRAMES = 5
STEPS = 8
GUIDE = 5.0
SHIFT = 5.0
PROMPT = "a tiny test video"
NPROMPT = "blurry, low quality"


def _ctx_for(prompt: str, text_dim: int, length: int) -> np.ndarray:
    """Deterministic fake text embedding per prompt (the T5 encoders are
    parity-tested separately; here both stacks get the same context)."""
    seed = abs(hash(prompt)) % (2 ** 31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal((length, text_dim)).astype(np.float32)


class _TextEncoderStub:
    """Stands in for the reference T5EncoderModel wrapper: returns a list
    of unpadded [len_i, text_dim] tensors (t5.py:506-518 trims to true
    lengths)."""

    def __init__(self, text_dim, length):
        self.text_dim = text_dim
        self.length = length

    def __call__(self, texts, device):
        import torch

        return [torch.from_numpy(_ctx_for(t, self.text_dim, self.length))
                for t in texts]


class _VaeFacade:
    """The reference WanVAE facade (vae.py:619-663) for a tiny z_dim,
    recording the latents handed to decode."""

    def __init__(self, inner, z_dim):
        import torch

        self.model = inner
        mean = torch.tensor(jvae.LATENT_MEAN[:z_dim])
        std = torch.tensor(jvae.LATENT_STD[:z_dim])
        self.scale = [mean, 1.0 / std]
        self.captured = None

    def decode(self, zs):
        import torch

        self.captured = [z.detach().clone() for z in zs]
        with torch.no_grad():
            return [
                self.model.decode(u.unsqueeze(0), self.scale)
                .float().clamp_(-1, 1).squeeze(0) for u in zs
            ]


@pytest.fixture(scope="module")
def rigs():
    """(reference WanT2V rig, our pipeline) with identical weights."""
    import torch

    torch.manual_seed(0)
    mcfg = CONFIG.model
    vcfg = CONFIG.vae

    t2v_mod = ref_loader.load_ref_text2video()
    ref_model_mod = ref_loader.load_ref_model()
    ref_vae_mod = ref_loader.load_ref_vae()

    dit = ref_model_mod.WanModel(
        model_type=mcfg.model_type, patch_size=list(mcfg.patch_size),
        text_len=mcfg.text_len, in_dim=mcfg.in_dim, dim=mcfg.dim,
        ffn_dim=mcfg.ffn_dim, freq_dim=mcfg.freq_dim,
        text_dim=mcfg.text_dim, out_dim=mcfg.out_dim,
        num_heads=mcfg.num_heads, num_layers=mcfg.num_layers,
        qk_norm=mcfg.qk_norm, cross_attn_norm=mcfg.cross_attn_norm,
        eps=mcfg.eps).eval().float()
    vae_inner = ref_vae_mod.WanVAE_(
        dim=vcfg.dim, z_dim=vcfg.z_dim, dim_mult=list(vcfg.dim_mult),
        num_res_blocks=vcfg.num_res_blocks,
        attn_scales=list(vcfg.attn_scales),
        temperal_downsample=list(vcfg.temporal_downsample)).eval().float()

    # reference pipeline rig: bypass __init__ (it hardcodes CUDA and
    # loads real checkpoints); wire exactly the attrs generate() reads
    rig = t2v_mod.WanT2V.__new__(t2v_mod.WanT2V)
    rig.device = torch.device("cpu")
    rig.rank = 0
    rig.t5_cpu = True
    rig.num_train_timesteps = CONFIG.num_train_timesteps
    rig.param_dtype = torch.float32
    rig.vae_stride = tuple(CONFIG.vae_stride)
    rig.patch_size = tuple(mcfg.patch_size)
    rig.sp_size = 1
    rig.sample_neg_prompt = NPROMPT
    rig.text_encoder = _TextEncoderStub(mcfg.text_dim, mcfg.text_len)
    rig.vae = _VaeFacade(vae_inner, vcfg.z_dim)
    rig.model = dit

    # our pipeline with the SAME weights (converted), fp32 compute
    pipe = WanT2V(config=CONFIG, checkpoint_dir=None)
    dit_sd = {k: v.detach().float().numpy()
              for k, v in dit.state_dict().items()}
    pipe.dit_params = convert_wan_state_dict(dit_sd, mcfg,
                                             dtype=jnp.float32)
    vae_sd = {k: v.detach().float().numpy()
              for k, v in vae_inner.state_dict().items()}
    pipe.vae_params = convert_vae_state_dict(vae_sd, vcfg,
                                             dtype=jnp.float32)

    def encode_text(texts):
        rows = [_ctx_for(t, mcfg.text_dim, mcfg.text_len) for t in texts]
        return jnp.asarray(np.stack(rows), jnp.float32)

    pipe.encode_text = encode_text
    return rig, pipe


def _ref_generate(rig, solver):
    import torch

    video = rig.generate(
        PROMPT, size=SIZE, frame_num=FRAMES, shift=SHIFT,
        sample_solver=solver, sampling_steps=STEPS, guide_scale=GUIDE,
        n_prompt=NPROMPT, seed=7, offload_model=False)
    latent = rig.vae.captured[0].numpy()
    # the exact noise generate() drew (text2video.py:170-195): replay the
    # same seeded generator
    g = torch.Generator(device="cpu")
    g.manual_seed(7)
    z = CONFIG.vae.z_dim
    noise = torch.randn(z, (FRAMES - 1) // 4 + 1, SIZE[1] // 8,
                        SIZE[0] // 8, dtype=torch.float32,
                        generator=g).numpy()
    return video.numpy(), latent, noise


def _force_fp32_compute(pipe, monkeypatch):
    """Pin the DiT compute to fp32 for a tight oracle (the serving path
    defaults to bf16 — the fidelity comparison needs the same arithmetic
    both sides; the reference rig runs fp32 since CPU autocast is a
    no-op)."""
    from moviigen_tpu.models import wan_model as wm

    orig = wm.forward

    def fp32_forward(params, x, t, context, cfg, rope, **kw):
        kw["compute_dtype"] = jnp.float32
        kw["attn_backend"] = "xla"
        return orig(params, x, t, context, cfg, rope, **kw)

    monkeypatch.setattr(wm, "forward", fp32_forward)


@pytest.mark.parametrize("solver", ["unipc", "dpm++"])
def test_fullstack_generate_parity(rigs, solver, monkeypatch):
    """model + scheduler + CFG + VAE decode chained across both stacks:
    final latents near-bit-equal given identical noise/weights/context;
    decoded videos at PSNR > 40 dB."""
    rig, pipe = rigs
    _force_fp32_compute(pipe, monkeypatch)

    ref_video, ref_latent, noise = _ref_generate(rig, solver)

    got_latent = pipe.generate(
        PROMPT, size=SIZE, frame_num=FRAMES, shift=SHIFT,
        sample_solver=solver, sampling_steps=STEPS, guide_scale=GUIDE,
        n_prompt=NPROMPT, noise=noise, return_latents=True,
        scan_loop=False)
    assert got_latent.shape == ref_latent.shape
    np.testing.assert_allclose(got_latent, ref_latent, atol=2e-3,
                               rtol=2e-3)

    got_video = pipe.generate(
        PROMPT, size=SIZE, frame_num=FRAMES, shift=SHIFT,
        sample_solver=solver, sampling_steps=STEPS, guide_scale=GUIDE,
        n_prompt=NPROMPT, noise=noise, scan_loop=False)
    assert got_video.shape == ref_video.shape
    p = psnr(got_video, ref_video, data_range=2.0)
    assert p > 40.0, f"decoded PSNR {p:.1f} dB below the fidelity bar"


def test_fullstack_latent_trajectory_unipc(rigs, monkeypatch):
    """Tighter single-point probe: one denoise STEP must agree to fp32
    rounding (isolates step-level drift from 8-step compounding)."""
    import torch

    rig, pipe = rigs
    _force_fp32_compute(pipe, monkeypatch)

    _, _, noise = _ref_generate(rig, "unipc")

    # reference: one UniPC step by hand through its scheduler
    fmu = ref_loader.load_ref_solvers()[1]
    sched = fmu.FlowUniPCMultistepScheduler(
        num_train_timesteps=CONFIG.num_train_timesteps, shift=1,
        use_dynamic_shifting=False)
    sched.set_timesteps(STEPS, device="cpu", shift=SHIFT)
    t0 = sched.timesteps[0]
    ctx_c = rig.text_encoder([PROMPT], "cpu")
    ctx_n = rig.text_encoder([NPROMPT], "cpu")
    lat = [torch.from_numpy(noise)]
    with torch.no_grad():
        c = rig.model(lat, t=torch.stack([t0]), context=ctx_c,
                      seq_len=32)[0]
        u = rig.model(lat, t=torch.stack([t0]), context=ctx_n,
                      seq_len=32)[0]
    pred = u + GUIDE * (c - u)
    want = sched.step(pred.unsqueeze(0), t0, lat[0].unsqueeze(0),
                      return_dict=False)[0][0].numpy()

    # ours: the same single step through the pipeline's own compiled
    # CFG-step closure + host scheduler (what generate() iterates)
    from moviigen_tpu.diffusion import FlowUniPCMultistepScheduler
    from moviigen_tpu.pipelines.text2video import \
        compute_target_shape_and_seq_len

    _, seq_len, grid = compute_target_shape_and_seq_len(
        CONFIG, SIZE, FRAMES, 1)
    step_fn = pipe._denoise_fn(grid, seq_len, GUIDE)
    ours = FlowUniPCMultistepScheduler(
        num_train_timesteps=CONFIG.num_train_timesteps, shift=1.0)
    ours.set_timesteps(STEPS, shift=SHIFT)
    latent = jnp.asarray(noise, jnp.float32)[None]
    state = ours.init_state(latent)
    ctx_pair = pipe.encode_text([PROMPT, NPROMPT])
    t_dev = jnp.asarray([float(ours.timesteps[0])], jnp.float32)
    noise_pred = step_fn(pipe.dit_params, latent, t_dev, ctx_pair)
    got, _ = ours.step(noise_pred, 0, latent, state)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=5e-5,
                               rtol=1e-4)
