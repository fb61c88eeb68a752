"""Fast parameter initialization without per-leaf XLA RNG compiles.

`flax.Module.init` compiles one threefry kernel per parameter (~300 for the
UNet), which costs minutes on first run.  Production paths load checkpoints
(models/loader.py); tests and weight-free benchmarks use this helper, which
shapes the param tree via `jax.eval_shape` (no compile) and fills it with a
host-side numpy PRNG using torch-matching fan-in scaling.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def random_params(module, seed: int, *init_args, **init_kwargs) -> Any:
    """Build a module's param tree with numpy-filled values (fast, no jit)."""
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *init_args, **init_kwargs))
    rng = np.random.default_rng(seed)

    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    out = {}
    for name, leaf in flat.items():
        shape, dtype = leaf.shape, leaf.dtype
        last = name.rsplit("/", 1)[-1]
        segs = name.split("/")
        if any(s.startswith("zero") for s in segs) or "cond_embedding/conv_out" in name:
            # ControlNet gating convs are zero-initialized by design
            val = np.zeros(shape, np.float32)
        elif last == "bias" or (last == "weight" and len(shape) == 1):
            # biases zero; 1-D 'weight' = norm scale -> ones
            val = np.zeros(shape, np.float32) if last == "bias" else np.ones(shape, np.float32)
        elif last in ("token_embedding", "position_embedding"):
            val = rng.normal(0.0, 0.02, size=shape).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])
            bound = float(np.sqrt(3.0 / max(fan_in, 1)))
            val = rng.uniform(-bound, bound, size=shape).astype(np.float32)
        out[name] = jnp.asarray(val.astype(dtype))
    return {"params": traverse_util.unflatten_dict(out, sep="/")}
