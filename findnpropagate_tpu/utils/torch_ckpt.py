"""Torch-free PyTorch-checkpoint reader.

Reads `.pth` files written by `torch.save` (the reference's checkpoint
format, tools/train_utils/train_utils.py:414-447 under /root/reference:
{epoch, it, model_state, optimizer_state, version}) into plain numpy arrays
using only zipfile + pickle — no torch import required, so the 94 MB
reference TransFusion checkpoints can be ingested on any host.

Supports the zipfile serialization format (torch >= 1.6: `<name>/data.pkl`
plus one raw little-endian buffer per storage under `<name>/data/<key>`).
Tensors are materialized through their (size, stride, storage_offset)
metadata, covering non-contiguous saves.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",  # handled specially
}


class _StorageStub:
    """Lazy handle to one storage buffer inside the archive."""

    def __init__(self, zf, prefix, key, dtype_name):
        self.zf = zf
        self.prefix = prefix
        self.key = key
        self.dtype_name = dtype_name
        self._data = None

    def data(self):
        if self._data is None:
            raw = self.zf.read(f"{self.prefix}/data/{self.key}")
            if self.dtype_name == "BFloat16Storage":
                u16 = np.frombuffer(raw, dtype="<u2")
                self._data = (
                    (u16.astype(np.uint32) << 16).view(np.float32).copy()
                )
            else:
                dt = np.dtype(_STORAGE_DTYPES[self.dtype_name])
                self._data = np.frombuffer(
                    raw, dtype=dt.newbyteorder("<")
                    if dt.itemsize > 1 else dt
                ).copy()
        return self._data


class _DtypeMarker:
    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    base = storage.data()
    if len(size) == 0:
        return base[storage_offset].copy()
    item = base.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * item for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf, prefix):
        super().__init__(file, encoding="latin1")
        self.zf = zf
        self.prefix = prefix

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        marker, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        name = marker.name if isinstance(marker, _DtypeMarker) else str(marker)
        return _StorageStub(self.zf, self.prefix, key, name)

    def find_class(self, module, name):
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _DtypeMarker(name)
        if module == "torch" and name.endswith("dtype"):
            return str
        if module in ("collections", "builtins", "__builtin__",
                      "numpy", "numpy.core.multiarray", "numpy._core.multiarray",
                      "numpy.dtype"):
            return super().find_class(module, name)
        if module == "easydict" and name == "EasyDict":
            return dict
        # anything else (torch schedulers, custom classes): opaque dict stub
        class _Opaque(dict):
            def __setstate__(self, state):
                if isinstance(state, dict):
                    self.update(state)

        return _Opaque


def load_torch_pth(path):
    """Read a torch-zipfile `.pth` into nested python structures with numpy
    arrays at the leaves. bf16/f16 tensors are widened to f32."""
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            n for n in zf.namelist() if n.endswith("/data.pkl")
        )
        prefix = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            data = io.BytesIO(f.read())
        obj = _Unpickler(data, zf, prefix).load()
    return _widen(obj)


def _widen(obj):
    if isinstance(obj, np.ndarray):
        if obj.dtype == np.float16:
            return obj.astype(np.float32)
        return obj
    if isinstance(obj, dict):
        return {k: _widen(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_widen(v) for v in obj)
    return obj
