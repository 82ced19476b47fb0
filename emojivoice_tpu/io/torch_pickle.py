"""Torch-free reader for PyTorch checkpoint files.

PyTorch ≥1.6 saves a zip archive: ``archive/data.pkl`` (a pickle whose
tensors are persistent-id references) plus ``archive/data/<key>`` raw
storage blobs.  This module unpickles that format with a custom Unpickler
that materializes tensors as numpy arrays — no torch import required, so
the TPU runtime image stays torch-free.  (When torch *is* importable the
loaders in torch_ckpt.py still prefer this path for determinism.)

Legacy (pre-zip) torch files fall back to ``torch.load`` when available.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


class _Storage:
    def __init__(self, data: bytes, dtype, numel: int):
        self.data = data
        self.dtype = dtype
        self.numel = numel


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    if storage.dtype is None:  # bfloat16 → upcast via uint16 view
        raw = np.frombuffer(storage.data, dtype=np.uint16)
        arr32 = (raw.astype(np.uint32) << 16).view(np.float32)
        flat = arr32
        itemsize = 4
    else:
        flat = np.frombuffer(storage.data, dtype=storage.dtype)
        itemsize = flat.dtype.itemsize
    if not size:
        return np.asarray(flat[storage_offset])
    # strides are in elements
    return np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=tuple(s * itemsize for s in stride)
    ).copy()


class _FakeClass:
    """Stand-in for classes absent from this image (lightning, omegaconf …).

    Captures everything the pickle stream carries — ``__setstate__`` state,
    dict-subclass items (AttributeDict), list-subclass items — so callers
    like io.torch_ckpt.extract_hyper_parameters can walk the data without
    the original package."""

    def __init__(self, *args, **kwargs):
        self.args = args

    def __call__(self, *args, **kwargs):
        return self

    def __setstate__(self, state):
        self.state = state

    # NEWOBJ restores skip __init__, so the item stores are lazy
    def __setitem__(self, k, v):  # dict-subclass pickles: obj[k] = v
        self.__dict__.setdefault("dict_items", {})[k] = v

    def append(self, v):  # list-subclass pickles: obj.append(v)
        self.__dict__.setdefault("list_items", []).append(v)

    def extend(self, vs):
        self.__dict__.setdefault("list_items", []).extend(vs)


class _ODict(dict):
    """OrderedDict stand-in: a real nn.Module.state_dict() pickles with
    instance state (the `_metadata` attribute), which plain `dict` cannot
    BUILD — a dict subclass has a __dict__ and accepts it."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


def _fake_module_factory(module: str, name: str):
    if name == "_rebuild_tensor_v2":
        return _rebuild_tensor_v2
    if name == "_rebuild_parameter":
        return lambda data, requires_grad=True, hooks=None: data
    if module == "collections" and name == "OrderedDict":
        return _ODict
    if module == "torch" and name.endswith("Storage"):
        cls = type(name, (), {"np_dtype": _DTYPE_MAP.get(name, np.float32), "_is_storage_type": True})
        return cls
    if module == "torch" and name in ("float32", "float64", "float16", "bfloat16", "int64",
                                      "int32", "int16", "int8", "uint8", "bool"):
        return name
    return type(name, (_FakeClass,), {"__module__": module})


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module, name):
        if module.startswith("torch") or module == "collections":
            return _fake_module_factory(module, name)
        try:
            return super().find_class(module, name)
        except Exception:  # noqa: BLE001 — unknown class → inert stand-in
            return _fake_module_factory(module, name)

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
        assert typename == "storage", f"unexpected persistent id {typename}"
        name = f"{self.prefix}/data/{key}"
        data = self.zf.read(name)
        np_dtype = getattr(storage_type, "np_dtype", np.float32)
        if isinstance(storage_type, str):
            np_dtype = _DTYPE_MAP.get(storage_type, np.float32)
        return _Storage(data, np_dtype, numel)


def load_torch_file(path: str) -> Any:
    """Load a torch-saved object (zip format) as nested python/numpy data."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl — not a torch zip checkpoint")
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            up = _TorchUnpickler(io.BufferedReader(f), zf, prefix)
            return up.load()


def flatten_state_dict(obj: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a (possibly nested) state dict to {dotted_name: ndarray}."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            name = f"{prefix}.{k}" if prefix else str(k)
            out.update(flatten_state_dict(v, name))
    elif isinstance(obj, np.ndarray):
        out[prefix] = obj
    elif np.isscalar(obj):
        out[prefix] = np.asarray(obj)
    return out
