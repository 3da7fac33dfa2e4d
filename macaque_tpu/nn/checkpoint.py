"""Orbax checkpointing for converted model weights.

The reference distributes .pth checkpoints loaded through torch on every
run (step1:98-120). Here weights are converted once
(nn/convert.py) and saved as Orbax checkpoints for fast native reload —
no torch dependency on the serving path.
"""

from __future__ import annotations

import os


def save_params(path: str, variables) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, variables, force=True)
    ckpt.wait_until_finished()
    return path


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        return ckpt.restore(os.path.abspath(path), target=like)
    return ckpt.restore(os.path.abspath(path))


def convert_and_cache(pth_path: str, converter, cache_dir: str):
    """Convert a .pth once and cache as an Orbax checkpoint; later calls
    load the cache directly (no torch)."""
    name = os.path.splitext(os.path.basename(pth_path))[0]
    out = os.path.join(os.path.abspath(cache_dir), name + ".orbax")
    if os.path.exists(out):
        return load_params(out)
    from macaque_tpu.nn.convert import load_torch_checkpoint

    variables = converter(load_torch_checkpoint(pth_path))
    save_params(out, variables)
    return variables
