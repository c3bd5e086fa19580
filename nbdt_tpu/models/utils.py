"""Checkpoint fetching and state-dict coercion.

Rebuild of reference ``nbdt/models/utils.py``: released ``.pth`` checkpoints
are keyed by (arch, dataset[, hierarchy]) in ``model_urls`` tables; loading
tolerates ``module.`` (DataParallel) and ``net`` wrapping (models/
utils.py:7-17, 65-76). Downloads go through a local cache and fail with a
clear message offline — a local file may always be supplied instead.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def checkpoint_cache_dir() -> Path:
    root = os.environ.get(
        "NBDT_CHECKPOINT_DIR", os.path.expanduser("~/.cache/nbdt_tpu/checkpoints")
    )
    return Path(root)


def coerce_state_dict(state_dict, reference_state_dict=None) -> dict:
    """Normalize ``net``/``module.`` wrapping (reference models/utils.py:65-76).

    Unconditionally unwraps; the optional ``reference_state_dict`` is kept
    for API parity but unused (the Flax converter is key-driven).
    """
    if "net" in state_dict and not hasattr(state_dict["net"], "shape"):
        state_dict = state_dict["net"]
    if "state_dict" in state_dict and not hasattr(state_dict["state_dict"], "shape"):
        state_dict = state_dict["state_dict"]
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def load_torch_checkpoint(path) -> dict:
    """Read a torch ``.pth`` file into a flat {key: numpy array} dict."""
    import numpy as np
    import torch

    data = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(data, dict):
        data = coerce_state_dict(data)
    return {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in data.items()
        if hasattr(v, "shape") or hasattr(v, "detach")
    }


def download_checkpoint(url: str, dest: Path) -> Path:
    from urllib.request import urlretrieve

    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(".tmp")
    urlretrieve(url, str(tmp))
    tmp.rename(dest)
    return dest


def load_state_dict_from_key(
    keys,
    model_urls: dict,
    pretrained: bool = True,
    checkpoint_path: Optional[str] = None,
) -> dict:
    """Resolve a released checkpoint by (arch, dataset[, hierarchy]) keys
    (reference models/utils.py:83-103). Returns a flat numpy state dict."""
    if checkpoint_path:
        return load_torch_checkpoint(checkpoint_path)

    valid_keys = [key for key in keys if key in model_urls]
    if not valid_keys:
        raise KeyError(
            f"No pretrained checkpoint for any of {keys}. "
            f"Available: {sorted(model_urls)}"
        )
    url = model_urls[valid_keys[-1]]
    fname = url.rsplit("/", 1)[-1]
    cached = checkpoint_cache_dir() / fname
    if not cached.exists():
        try:
            download_checkpoint(url, cached)
        except Exception as e:
            raise RuntimeError(
                f"Could not download pretrained checkpoint {url} "
                f"(offline?). Place the file at {cached} or pass "
                f"checkpoint_path=... explicitly. Original error: {e}"
            ) from e
    return load_torch_checkpoint(cached)
