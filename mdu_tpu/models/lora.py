"""LoRA loading and merging.

The reference delegates LoRA to A1111's extra-networks machinery and
activates/deactivates networks around each region's denoise call
(ref multidiffusion.py:180-182, 200-202).  Here LoRA is explicit: a
safetensors state (kohya ``lora_unet_*``/``lora_te_*`` or diffusers/peft
``*.lora_A/B``) merges into a param tree as ``W += scale * (alpha/r) *
up @ down``; per-region networks become per-region merged param trees passed
to the tiled denoiser (pipeline ``region_unet_params``).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from .loader import translate_unet_name


def _norm(name: str) -> str:
    return name.replace(".", "_")


def _collect_lora_modules(state: Dict[str, np.ndarray], prefix: str):
    """-> {module_key: (down, up, alpha)} with module_key underscore-normalized."""
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        if not k.startswith(prefix):
            continue
        body = k[len(prefix):]
        m = re.match(r"(.+?)\.(lora_down|lora_up|lora_A|lora_B|alpha)(?:\.weight)?$", body)
        if not m:
            continue
        mod, part = m.group(1), m.group(2)
        part = {"lora_A": "lora_down", "lora_B": "lora_up"}.get(part, part)
        mods.setdefault(_norm(mod), {})[part] = np.asarray(v)
    out = {}
    for mod, parts in mods.items():
        if "lora_down" in parts and "lora_up" in parts:
            out[mod] = (parts["lora_down"], parts["lora_up"], parts.get("alpha"))
    return out


def merge_lora(
    params: Any,
    lora_state: Dict[str, np.ndarray],
    scale: float = 1.0,
    prefix: str = "lora_unet_",
    translate: Callable[[str], str] = translate_unet_name,
) -> Any:
    """Return a new param tree with the LoRA deltas merged in."""
    mods = _collect_lora_modules(lora_state, prefix)
    if not mods:
        return params

    flat = dict(traverse_util.flatten_dict(params["params"], sep="/"))
    matched = set()
    for name in list(flat.keys()):
        if not name.endswith("/weight"):
            continue
        base = translate(name)
        key = _norm(base[: -len(".weight")] if base.endswith(".weight") else base)
        if key not in mods:
            continue
        down, up, alpha = mods[key]
        r = down.shape[0]
        eff = scale * (float(alpha) / r if alpha is not None else 1.0)
        w = np.asarray(flat[name], np.float32)
        if w.ndim == 2:
            delta = up.reshape(up.shape[0], -1) @ down.reshape(r, -1)
        else:  # conv: up [O,r,1,1] @ down [r,I,kh,kw]
            delta = np.einsum("or,ri->oi", up.reshape(up.shape[0], r),
                              down.reshape(r, -1)).reshape(w.shape)
        flat[name] = jnp.asarray(w + eff * delta.reshape(w.shape)).astype(flat[name].dtype)
        matched.add(key)
    return {"params": traverse_util.unflatten_dict(flat, sep="/")}


def merge_loras(params: Any, loras: Sequence[Tuple[Dict[str, np.ndarray], float]],
                **kw) -> Any:
    for state, scale in loras:
        params = merge_lora(params, state, scale, **kw)
    return params
