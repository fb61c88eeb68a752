"""Export a flax params tree as a flat safetensors file.

Writes the layout ``models/loader.py::load_guidance`` consumes: one tensor
per parameter, keyed by the flax path with '/' separators (e.g.
``down_0_res_0/norm1/scale``).  Use it to publish owned-model weights
(StableSR-style guidance encoders, fine-tuned ControlNets) in a form the
CLI can load back:

    python scripts/export_params.py guidance.msgpack guidance.safetensors
    python -m mdu_tpu.cli img2img ... --guidance-model guidance.safetensors

Input formats: an orbax/flax .msgpack checkpoint, or a .npz of already-flat
names.  Library use: ``save_flat_params(params_tree, path)``.
"""
from __future__ import annotations

import sys

import numpy as np


def save_flat_params(params, path: str) -> None:
    """Flatten a flax params tree ({'params': ...} or bare) to safetensors."""
    from flax import traverse_util
    from safetensors.numpy import save_file

    tree = params.get("params", params) if isinstance(params, dict) else params
    flat = traverse_util.flatten_dict(tree, sep="/")
    save_file({k: np.asarray(v) for k, v in flat.items()}, path)


def main(argv):
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 1
    src, dst = argv[1], argv[2]
    if src.endswith(".msgpack"):
        from flax.serialization import msgpack_restore

        with open(src, "rb") as f:
            params = msgpack_restore(f.read())
    elif src.endswith(".npz"):
        params = dict(np.load(src))
    else:
        print(f"unsupported input {src!r} (.msgpack or .npz)", file=sys.stderr)
        return 1
    save_flat_params(params, dst)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
