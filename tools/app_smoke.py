"""On-device smoke of the validation watcher + gradio app (VERDICT r3
item 8: both had only run under CPU CI with tiny configs; their on-TPU
behavior — compile-cache reuse across checkpoint reloads, HBM lifecycle
across pipeline rebuilds — was unproven).

Flow (tiny config, random weights — no checkpoints exist in this env):
  1. fabricate checkpoint-step_1 in a temp training dir;
  2. run the watcher once (cli/valid_training.py --once): renders the
     validation prompt through the REAL pipeline (T5 encode → denoise →
     VAE decode → video file) — timed;
  3. fabricate checkpoint-step_2 and run the watcher again in the same
     process: a fresh WanT2V is constructed (watcher behavior per
     checkpoint), so this pass measures reload + compile-cache reuse;
  4. drive the gradio app's real generate callback (UI layer stubbed —
     gradio isn't installed here) through build_app, twice, timing the
     warm second call.

Run on the TPU:  python tools/app_smoke.py
"""

import argparse
import sys
import tempfile
import time
import types

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[app_smoke {time.strftime('%H:%M:%S')}] {msg}", flush=True)


class _Component:
    def __init__(self, *a, **k):
        self.label = k.get("label")
        self.value = k.get("value")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Clickable(_Component):
    registry = []

    def click(self, fn, inputs=None, outputs=None):
        _Clickable.registry.append(
            {"fn": fn, "inputs": inputs, "outputs": outputs})


def _install_gradio_stub():
    gr = types.ModuleType("gradio")
    for name in ("Blocks", "Row", "Column", "Textbox", "Radio",
                 "Dropdown", "Slider", "Number", "Video", "Markdown"):
        setattr(gr, name, type(name, (_Component,), {}))
    gr.Button = type("Button", (_Clickable,), {})
    sys.modules["gradio"] = gr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-tiny")
    ap.add_argument("--size", default="480*832")
    ap.add_argument("--frame_num", type=int, default=5)
    ap.add_argument("--sample_steps", type=int, default=2)
    args = ap.parse_args()

    import jax

    from moviigen_tpu.cli.valid_training import main as watch_main
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.training.checkpoint import save_checkpoint
    from moviigen_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    import os

    tmp = tempfile.mkdtemp(prefix="app_smoke_")
    out = os.path.join(tmp, "train_out")
    prompts = os.path.join(tmp, "prompts")
    os.makedirs(prompts)
    with open(os.path.join(prompts, "valid0.txt"), "w") as f:
        f.write("a red panda rides a bicycle through a bamboo forest\n")

    cfg = WAN_CONFIGS[args.task].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(out, 1, params)
    log("checkpoint-step_1 saved")

    watch_args = ["--task", args.task, "--output_dir", out,
                  "--prompt_dir", prompts, "--size", args.size,
                  "--frame_num", str(args.frame_num),
                  "--sample_steps", str(args.sample_steps), "--once"]
    t0 = time.perf_counter()
    watch_main(watch_args)
    cold = time.perf_counter() - t0
    log(f"watcher pass 1 (cold: compiles T5+DiT+VAE) {cold:.1f}s")

    save_checkpoint(out, 2, params)
    t0 = time.perf_counter()
    watch_main(watch_args)
    warm = time.perf_counter() - t0
    log(f"watcher pass 2 (new checkpoint, fresh pipeline) {warm:.1f}s "
        f"— compile-cache reuse {'OK' if warm < 0.7 * cold else 'WEAK'} "
        f"({warm / max(cold, 1e-9):.2f}x of cold)")

    for step in (1, 2):
        vids = os.listdir(os.path.join(out, f"checkpoint-step_{step}",
                                       "validation_videos"))
        assert vids, f"no validation video for step {step}"
        log(f"checkpoint-step_{step}: {vids}")

    # gradio app: real generate callback through the stubbed UI
    _install_gradio_stub()
    _Clickable.registry = []
    from moviigen_tpu.apps.gradio_t2v import build_app

    app_args = types.SimpleNamespace(
        task=args.task, ckpt_dir=None, frame_num=args.frame_num,
        prompt_extend_method="local_qwen", prompt_extend_model=None)
    build_app(app_args)
    gen = next(cb["fn"] for cb in _Clickable.registry
               if cb["fn"].__name__ == "generate")
    os.chdir(tmp)
    t0 = time.perf_counter()
    path = gen("a cat in the rain", args.size, args.sample_steps,
               5.0, 5.0, 7, "")
    g1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    path = gen("a dog in the sun", args.size, args.sample_steps,
               5.0, 5.0, 8, "")
    g2 = time.perf_counter() - t0
    log(f"gradio generate: cold {g1:.1f}s, warm {g2:.1f}s -> {path}")
    assert os.path.exists(path)
    log("APP SMOKE OK")


if __name__ == "__main__":
    main()
