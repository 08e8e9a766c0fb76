"""Load reference (PyTorch) modules from /root/reference as standalone
test oracles, stubbing their unavailable dependencies (diffusers,
flash-attn, ftfy). Tests using these helpers skip when the reference tree
is absent."""

import importlib.util
import os
import sys
import types

REF = "/root/reference"


def ref_available() -> bool:
    return os.path.isdir(os.path.join(REF, "wan", "modules"))


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_vae():
    return _load("ref_vae", os.path.join(REF, "wan/modules/vae.py"))


def _stub_diffusers():
    import torch.nn as nn

    if "diffusers" in sys.modules:
        return
    diffusers = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")
    mu = types.ModuleType("diffusers.models")
    mmu = types.ModuleType("diffusers.models.modeling_utils")

    class ConfigMixin:
        def register_to_config(self, **kw):
            # instance form (fm_solvers_unipc.py:99); the decorator form
            # is the module-level function below / its solver-grade
            # upgrade in _stub_diffusers_schedulers
            if not hasattr(self, "config"):
                object.__setattr__(self, "config", types.SimpleNamespace())
            for k, v in kw.items():
                setattr(self.config, k, v)

    def register_to_config(fn):
        return fn

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    mmu.ModelMixin = nn.Module
    diffusers.configuration_utils = cu
    diffusers.models = mu
    mu.modeling_utils = mmu
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cu
    sys.modules["diffusers.models"] = mu
    sys.modules["diffusers.models.modeling_utils"] = mmu


def _stub_diffusers_schedulers():
    """Extend the diffusers stub with what the reference flow-matching
    solvers import (``fm_solvers*.py:10-16``): a *working*
    ``register_to_config`` (the solvers read ``self.config.<init kwarg>``
    throughout), SchedulerMixin/SchedulerOutput, and utils."""
    import functools
    import inspect

    import torch

    _stub_diffusers()
    diffusers = sys.modules["diffusers"]
    cu = sys.modules["diffusers.configuration_utils"]

    if getattr(cu, "_solver_ready", False):
        return

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items()
                   if k not in ("self", "kwargs")}
            object.__setattr__(self, "config",
                               types.SimpleNamespace(**cfg))
            init(self, *args, **kwargs)

        return wrapper

    cu.register_to_config = register_to_config
    cu._solver_ready = True

    sched = types.ModuleType("diffusers.schedulers")
    su = types.ModuleType("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    su.SchedulerMixin = SchedulerMixin
    su.SchedulerOutput = SchedulerOutput
    su.KarrasDiffusionSchedulers = []  # only iterated for names
    sched.scheduling_utils = su
    diffusers.schedulers = sched
    sys.modules["diffusers.schedulers"] = sched
    sys.modules["diffusers.schedulers.scheduling_utils"] = su

    du = types.ModuleType("diffusers.utils")
    du.deprecate = lambda *a, **k: None
    du.is_scipy_available = lambda: False
    dtu = types.ModuleType("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, device=device,
                           dtype=dtype)

    dtu.randn_tensor = randn_tensor
    du.torch_utils = dtu
    diffusers.utils = du
    sys.modules["diffusers.utils"] = du
    sys.modules["diffusers.utils.torch_utils"] = dtu


def load_ref_solvers():
    """Reference FlowUniPC / FlowDPM solvers runnable on CPU. Returns
    (fm_solvers module, fm_solvers_unipc module)."""
    _stub_diffusers_schedulers()
    if "ref_fm_solvers" in sys.modules:
        return (sys.modules["ref_fm_solvers"],
                sys.modules["ref_fm_solvers_unipc"])
    fm = _load("ref_fm_solvers", os.path.join(REF, "wan/utils/fm_solvers.py"))
    fmu = _load("ref_fm_solvers_unipc",
                os.path.join(REF, "wan/utils/fm_solvers_unipc.py"))
    return fm, fmu


def load_ref_text2video():
    """Reference WanT2V pipeline (wan/text2video.py) runnable standalone
    on CPU: the DiT/solvers come from the standalone loaders above; T5,
    VAE and FSDP are import-stubbed (the test rig bypasses ``__init__``
    and wires its own components, so only ``generate`` runs)."""
    if "ref_text2video" in sys.modules:
        return sys.modules["ref_text2video"]
    load_ref_model()
    load_ref_solvers()
    path = os.path.join(REF, "wan/text2video.py")
    src = open(path).read() \
        .replace("from .distributed.fsdp import shard_model",
                 "shard_model = None") \
        .replace("from .modules.model import WanModel",
                 "from ref_model import WanModel") \
        .replace("from .modules.t5 import T5EncoderModel",
                 "T5EncoderModel = None") \
        .replace("from .modules.vae import WanVAE",
                 "WanVAE = None") \
        .replace("from .utils.fm_solvers import (",
                 "from ref_fm_solvers import (") \
        .replace("from .utils.fm_solvers_unipc import",
                 "from ref_fm_solvers_unipc import")
    mod = types.ModuleType("ref_text2video")
    mod.__file__ = path
    sys.modules["ref_text2video"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_ref_model():
    """Reference WanModel runnable on CPU: diffusers stubbed, the
    flash-attention call patched to the module's own fp32 SDPA fallback."""
    import torch

    _stub_diffusers()
    attn = _load("ref_attention",
                 os.path.join(REF, "wan/modules/attention.py"))

    def cpu_flash_attention(q, k, v, q_lens=None, k_lens=None, **kw):
        return attn.attention(q, k, v, q_lens=None, k_lens=None,
                              dtype=torch.float32)

    attn.flash_attention = cpu_flash_attention

    # model.py does `from .attention import flash_attention`; loading it as
    # a plain module needs the import rewritten to absolute.
    path = os.path.join(REF, "wan/modules/model.py")
    src = open(path).read().replace(
        "from .attention import flash_attention",
        "from ref_attention import flash_attention")
    mod = types.ModuleType("ref_model")
    mod.__file__ = path
    sys.modules["ref_model"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_ref_clip():
    """Reference CLIP (vision tower) runnable on CPU: torchvision,
    tokenizers stubbed; flash-attention patched to fp32 SDPA."""
    import torch

    attn = sys.modules.get("ref_attention")
    if attn is None:
        attn = _load("ref_attention",
                     os.path.join(REF, "wan/modules/attention.py"))

        def cpu_flash_attention(q, k, v, q_lens=None, k_lens=None, **kw):
            return attn.attention(q, k, v, q_lens=None, k_lens=None,
                                  dtype=torch.float32)

        attn.flash_attention = cpu_flash_attention

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Stub:
            def __init__(self, *a, **k):
                self.transforms = a[0] if a else []

        tvt.Compose = _Stub
        tvt.Resize = _Stub
        tvt.ToTensor = _Stub
        tvt.Normalize = _Stub
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    xlm_path = os.path.join(REF, "wan/modules/xlm_roberta.py")
    xlm_src = open(xlm_path).read()
    xlm = types.ModuleType("ref_xlm_roberta")
    xlm.__file__ = xlm_path
    sys.modules["ref_xlm_roberta"] = xlm
    exec(compile(xlm_src, xlm_path, "exec"), xlm.__dict__)

    path = os.path.join(REF, "wan/modules/clip.py")
    src = open(path).read() \
        .replace("from .attention import flash_attention",
                 "from ref_attention import flash_attention") \
        .replace("from .tokenizers import HuggingfaceTokenizer",
                 "HuggingfaceTokenizer = None") \
        .replace("from .xlm_roberta import XLMRoberta",
                 "from ref_xlm_roberta import XLMRoberta")
    mod = types.ModuleType("ref_clip")
    mod.__file__ = path
    sys.modules["ref_clip"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_ref_t5():
    """Reference T5 runnable on CPU: tokenizers import stubbed out."""
    path = os.path.join(REF, "wan/modules/t5.py")
    src = open(path).read().replace(
        "from .tokenizers import HuggingfaceTokenizer",
        "HuggingfaceTokenizer = None").replace(
        "torch.cuda.current_device()", "'cpu'")  # default-arg eval on import
    mod = types.ModuleType("ref_t5")
    mod.__file__ = path
    sys.modules["ref_t5"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_ref_tokenizers():
    """Reference tokenizers.py with ftfy stubbed to identity (ftfy is
    not in the image; the TPU wrapper likewise degrades to no-ftfy, so
    clean/pad/trim parity is exact for already-well-formed text)."""
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    return _load("ref_tokenizers",
                 os.path.join(REF, "wan/modules/tokenizers.py"))


def load_ref_qwen_vl():
    """Reference qwen_vl_utils with torchvision stubbed (host-only math —
    smart_resize/smart_nframes — needs no real torchvision)."""
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    tv.__version__ = getattr(tv, "__version__", "0.0.0-stub")
    if not hasattr(tv, "io"):
        tv.io = types.ModuleType("torchvision.io")
        sys.modules["torchvision.io"] = tv.io
    if not hasattr(tv, "transforms"):
        tvt = types.ModuleType("torchvision.transforms")
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt
    if not hasattr(tv.transforms, "InterpolationMode"):
        tv.transforms.InterpolationMode = types.SimpleNamespace(
            BICUBIC="bicubic")
    if "requests" not in sys.modules:
        try:
            import requests  # noqa: F401
        except ImportError:
            sys.modules["requests"] = types.ModuleType("requests")

    path = os.path.join(REF, "wan/utils/qwen_vl_utils.py")
    mod = types.ModuleType("ref_qwen_vl_utils")
    mod.__file__ = path
    sys.modules["ref_qwen_vl_utils"] = mod
    exec(compile(open(path).read(), path, "exec"), mod.__dict__)
    return mod


def load_ref_transforms():
    """Reference transform zoo (scripts/dataset/transform.py).

    The file ships live ``breakpoint()`` calls (center_crop_th_tw L133,
    CenterCropResizeVideo.__call__ L339-341) — PYTHONBREAKPOINT=0
    turns them into no-ops so the oracles are callable."""
    os.environ["PYTHONBREAKPOINT"] = "0"
    return _load("ref_transform",
                 os.path.join(REF, "scripts/dataset/transform.py"))
