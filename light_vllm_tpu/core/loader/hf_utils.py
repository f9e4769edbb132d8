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
        import contextlib
        import fcntl
        import hashlib
        import tempfile

        from huggingface_hub import snapshot_download

        # Exclusive flock around the download: two DP replicas (or two
        # engine processes) cold-starting the same model must not race
        # the snapshot fetch (reference:
        # core/loader/weight_utils.py:58-69 get_lock +
        # :188-239 lock around download_weights_from_hf).
        lock_dir = os.path.join(tempfile.gettempdir(), "lvt-locks")
        os.makedirs(lock_dir, exist_ok=True)
        lock_path = os.path.join(
            lock_dir,
            hashlib.sha256(model_path.encode()).hexdigest() + ".lock")
        with open(lock_path, "w") as lf, contextlib.ExitStack() as stack:
            fcntl.flock(lf, fcntl.LOCK_EX)
            stack.callback(fcntl.flock, lf, fcntl.LOCK_UN)
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
    (reference: weight_utils.py:374). numpy framework avoids torch —
    except fp8 tensors (prequantized checkpoints), which safetensors'
    numpy framework cannot map (numpy itself has no float8): those are
    read through torch and bit-viewed into ml_dtypes fp8."""
    from safetensors import safe_open

    _FP8_DTYPES = {"F8_E4M3": "float8_e4m3fn", "F8_E5M2": "float8_e5m2"}
    for file in files:
        fp8_names = {}
        with safe_open(file, framework="np") as f:
            for name in f.keys():
                dt = f.get_slice(name).get_dtype()
                if dt in _FP8_DTYPES:
                    fp8_names[name] = _FP8_DTYPES[dt]
                    continue
                yield name, f.get_tensor(name)
        if fp8_names:
            import ml_dtypes
            import torch

            with safe_open(file, framework="pt") as f:
                for name, dt in fp8_names.items():
                    t = f.get_tensor(name)
                    yield name, (t.view(torch.uint8).numpy()
                                 .view(getattr(ml_dtypes, dt)))


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


def kv_cache_scales_loader(filename: str, tp_rank: int, tp_size: int,
                           num_hidden_layers: int,
                           model_type: Optional[str] = None):
    """Read serialized per-layer KV-cache scaling factors: a JSON dict
    {"kv_cache": {"scaling_factor": {tp_rank: {layer: scale}}}}
    (reference: core/loader/weight_utils.py:411-450 — kept in sync with
    its extract_scales.py output format). Tolerant: any error logs and
    returns an empty iterable, i.e. scales default to 1.0."""
    try:
        with open(filename) as f:
            schema = json.load(f)
        factors = schema["kv_cache"]["scaling_factor"]
        rank_map = factors.get(str(tp_rank), factors.get(tp_rank))
        if rank_map is None:
            raise KeyError(f"tp rank {tp_rank} not in scaling_factor "
                           f"(ranks: {sorted(factors)})")
        out = [(int(k), float(v)) for k, v in rank_map.items()]
        missing = set(range(num_hidden_layers)) - {i for i, _ in out}
        if missing:
            logger.warning("kv-cache scales missing for layers %s of %s; "
                           "those default to 1.0", sorted(missing),
                           filename)
        return out
    except FileNotFoundError:
        logger.error("KV-cache scales file %r not found", filename)
    except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
        logger.error("error reading KV-cache scales from %r: %s",
                     filename, e)
    logger.warning("defaulting to KV-cache scaling factors = 1.0 for all "
                   "layers in TP rank %d", tp_rank)
    return []
