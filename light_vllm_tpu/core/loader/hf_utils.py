"""HF-hub config/weights access (reference:
light_vllm/core/models/transformers_utils/config.py)."""

import glob
import json
import os
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from light_vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def get_hf_config(model: str, trust_remote_code: bool = False,
                  revision: Optional[str] = None):
    from transformers import AutoConfig

    return AutoConfig.from_pretrained(model,
                                      trust_remote_code=trust_remote_code,
                                      revision=revision)


def resolve_weight_files(model_path: str) -> List[str]:
    """Locate safetensors (preferred) or torch .bin files for a local dir or
    downloaded snapshot (reference: light_vllm/core/loader/weight_utils.py:
    download_weights_from_hf:188, filtered by the safetensors index)."""
    if os.path.isdir(model_path):
        folder = model_path
    else:
        from huggingface_hub import snapshot_download

        folder = snapshot_download(
            model_path,
            allow_patterns=["*.safetensors", "*.json", "*.bin"])
    st = sorted(glob.glob(os.path.join(folder, "*.safetensors")))
    if st:
        index_file = os.path.join(folder, "model.safetensors.index.json")
        if os.path.exists(index_file):
            with open(index_file) as f:
                index = json.load(f)
            needed = {os.path.join(folder, v)
                      for v in index["weight_map"].values()}
            st = [f for f in st if f in needed]
        return st
    bins = sorted(glob.glob(os.path.join(folder, "*.bin")))
    if bins:
        return bins
    raise FileNotFoundError(f"no weight files found under {folder}")


def safetensors_weights_iterator(
        files: List[str]) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, np.ndarray) pairs from safetensors shards
    (reference: weight_utils.py:374). numpy framework avoids torch."""
    from safetensors import safe_open

    for file in files:
        with safe_open(file, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def pt_weights_iterator(files: List[str]) -> Iterator[Tuple[str, np.ndarray]]:
    """torch .bin fallback (reference: weight_utils.py:392); torch-cpu only
    at load time, tensors converted to numpy immediately."""
    import torch

    for file in files:
        state = torch.load(file, map_location="cpu", weights_only=True)
        for name, tensor in state.items():
            yield name, tensor.to(torch.float32).numpy()


def state_dict_iterator(state_dict: Dict[str, Any]
                        ) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate an in-memory state dict (torch tensors or ndarrays) — the
    offline-test path."""
    for name, tensor in state_dict.items():
        if hasattr(tensor, "detach"):
            t = tensor.detach()
            if t.dtype is not None and "bfloat16" in str(t.dtype):
                t = t.float()
            tensor = t.cpu().numpy()
        yield name, np.asarray(tensor)
