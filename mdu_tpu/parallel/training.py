"""Distributed diffusion training step (dp x tp mesh).

The reference is inference-only; this framework also ships a sharded
fine-tuning step so models it serves can be trained/tuned on the same mesh:

  * dp — batch data-parallelism (gradients all-reduced by GSPMD)
  * tp — tensor-parallelism over attention heads / FFN inner dim, expressed
    as NamedSharding on the torch-layout [out, in] linear weights; XLA
    inserts the all-gathers/reduce-scatters over ICI.

Loss: standard DDPM epsilon-MSE on the UNet.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import UNet2DCondition
from ..samplers.schedule import NoiseSchedule

# [out, in] linear weights whose OUT dim splits over tp (column parallel)
_COL_PARALLEL = ("to_q/weight", "to_k/weight", "to_v/weight", "proj/weight",
                 "fc1/weight", "q/weight", "k/weight", "v/weight")
# [out, in] linear weights whose IN dim splits over tp (row parallel)
_ROW_PARALLEL = ("to_out/weight", "out/weight", "fc2/weight")


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree: TP-shard attention/FFN linears, replicate rest."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    tp = mesh.shape.get("tp", 1)
    for name, leaf in flat.items():
        spec = P()
        if tp > 1 and leaf.ndim == 2:
            if name.endswith(_COL_PARALLEL) and leaf.shape[0] % tp == 0:
                spec = P("tp", None)
            elif name.endswith(_ROW_PARALLEL) and leaf.shape[1] % tp == 0:
                spec = P(None, "tp")
        out[name] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out, sep="/")


def make_train_step(
    unet: UNet2DCondition,
    mesh: Mesh,
    schedule: NoiseSchedule = None,
    learning_rate: float = 1e-5,
    remat: bool = False,
):
    """Returns (init_state, train_step) jitted over the mesh.

    ``batch`` = {'latents': [B,4,h,w], 'context': [B,L,D], (optional
    'added_cond')}; B shards over dp.
    """
    schedule = schedule or NoiseSchedule()
    tx = optax.adamw(learning_rate)
    ac = jnp.asarray(schedule.alphas_cumprod)

    apply_fn = unet.apply
    if remat:
        # rematerialize the UNet forward: trade FLOPs for activation memory
        apply_fn = jax.checkpoint(unet.apply, static_argnums=())

    def loss_fn(params, batch, key):
        lat = batch["latents"]
        B = lat.shape[0]
        k1, k2 = jax.random.split(key)
        t = jax.random.randint(k1, (B,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(k2, lat.shape, lat.dtype)
        a = ac[t].reshape(B, 1, 1, 1)
        x_t = jnp.sqrt(a) * lat + jnp.sqrt(1 - a) * noise
        pred = apply_fn(params, x_t, t.astype(jnp.float32),
                        batch["context"], batch.get("added_cond"))
        if schedule.prediction_type == "v_prediction":
            target = jnp.sqrt(a) * noise - jnp.sqrt(1 - a) * lat
        else:
            target = noise                     # epsilon objective
        return jnp.mean((pred - target) ** 2)

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_state(params):
        p_shard = {"params": param_shardings(params["params"], mesh)}
        params = jax.device_put(params, p_shard)
        opt_state = tx.init(params)
        return params, opt_state, p_shard

    batch_sharding = {
        "latents": NamedSharding(mesh, P("dp")),
        "context": NamedSharding(mesh, P("dp")),
    }

    def jitted_step(p_shard):
        return jax.jit(
            train_step,
            in_shardings=(p_shard, None, batch_sharding, None),
            out_shardings=(p_shard, None, None),
            donate_argnums=(0, 1),
        )

    return init_state, jitted_step
