"""Checkpoint key-census: strict state-dict consumption tracking.

The reference loads checkpoints through ``load_state_dict`` (strict by
default — ``wan/modules/t5.py:496``, ``vae.py:613-614``) or diffusers
``from_pretrained`` (``wan/text2video.py:87``), both of which error on
missing/unexpected keys. The converters here consume keys by name, which
without tracking would *silently ignore* renamed or extra keys in a real
checkpoint. ``TrackedStateDict`` records every key read; converters
assert afterwards that nothing in the source dict went unconsumed, and a
missing key raises with the converter context attached.

``expected_*_keys(cfg)`` manifests (wan_convert / t5 / vae_convert)
enumerate exactly the key set each converter consumes for a config;
tests check them two ways:
- tiny scale: real reference state dict → converter consumes exactly the
  manifest (and errors on extra/missing keys);
- full scale (14B / umT5-XXL / production VAE): manifest equals the key
  census of the reference torch module instantiated on the meta device
  (shape-only, no weight materialization).
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Set


class TrackedStateDict(Mapping):
    """Mapping wrapper recording which keys a converter consumed."""

    def __init__(self, sd: Mapping[str, Any], what: str = "checkpoint"):
        self._sd = sd
        self._what = what
        self.consumed: Set[str] = set()

    def __getitem__(self, key: str) -> Any:
        try:
            value = self._sd[key]
        except KeyError:
            raise KeyError(
                f"{self._what}: missing key '{key}' — the checkpoint "
                f"does not match the model config (renamed key, wrong "
                f"num_layers, or wrong variant)") from None
        self.consumed.add(key)
        return value

    def __contains__(self, key: object) -> bool:
        return key in self._sd

    def __iter__(self) -> Iterator[str]:
        return iter(self._sd)

    def __len__(self) -> int:
        return len(self._sd)

    def check_all_consumed(self) -> None:
        """Raise if any source key was never read by the converter —
        a silent-ignore is a silently-wrong model."""
        unused = sorted(set(self._sd) - self.consumed)
        if unused:
            preview = ", ".join(unused[:8])
            more = f" (+{len(unused) - 8} more)" if len(unused) > 8 else ""
            raise ValueError(
                f"{self._what}: {len(unused)} checkpoint key(s) not "
                f"consumed by the converter: {preview}{more} — refusing "
                f"to load a checkpoint the converter doesn't fully "
                f"understand (pass strict=False to override)")


def run_strict(convert, sd: Mapping[str, Any], what: str, strict: bool,
               *args, **kwargs):
    """Run ``convert(tracked_sd, *args, **kwargs)`` with consumption
    tracking; in strict mode verify every source key was consumed."""
    tracked = TrackedStateDict(sd, what)
    params = convert(tracked, *args, **kwargs)
    if strict:
        tracked.check_all_consumed()
    return params
