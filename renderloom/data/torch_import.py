"""Torch-free reader for PyTorch ``.pth`` checkpoints + name mapping.

The reference ships its entire inference story as pretrained torch
checkpoints (``Pose_Guided_Neural_Rendering/configs/HSM.yaml:2-3``:
``netG/netD_epoch006.pth``; ``Human_Motion_Modelling/configs/config.yaml``:
``model_epoch399.pth``; loader with DataParallel key-strip at
``Human_Motion_Modelling/utils/utils.py:64-82``).  renderloom must be able
to ingest them without torch: this module parses both torch serialization
formats with ``zipfile`` + ``pickle`` + ``numpy`` only:

* **zip format** (torch >= 1.6 default): a zip holding ``<root>/data.pkl``
  (a pickle whose tensors are persistent-id references) and raw
  little-endian storage blobs under ``<root>/data/<key>``.
* **legacy format** (torch < 1.6 — the reference trained on torch 1.3/1.4,
  so its published checkpoints are this): magic/protocol/sys-info pickles,
  the object pickle (storage refs again), the storage-key list, then each
  storage as ``int64 numel`` + raw bytes.

Only plain containers + tensors are allowed through ``find_class`` — no
arbitrary-code unpickling.  When the real ``torch`` is importable the
round-trip tests in ``tests/test_torch_import.py`` verify bit-exactness
against ``torch.save`` outputs in both formats.

Name mapping: :func:`map_motion_params` converts the reference motion
transformer state dict (``model_epochNNN.pth``, schema from
``Human_Motion_Modelling/models/transformer.py``) into a renderloom
``MotionTransformer`` param pytree; :func:`vgg19_state_to_npz` converts a
torchvision ``vgg19`` state dict into the ``vgg19_features.npz`` layout
consumed by ``renderloom.models.perceptual.load_torchvision_npz``.
"""

from __future__ import annotations

import collections
import io
import os
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

__all__ = [
    "read_pth", "flatten_state_dict", "strip_module_prefix",
    "map_motion_params", "vgg19_state_to_npz",
]

# torch storage class name -> numpy dtype (little-endian on every
# platform torch supports; TPU hosts are LE)
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": None,  # resolved lazily via ml_dtypes
}


def _bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """A deserialized persistent-id: typed storage whose bytes arrive
    separately (zip member / post-pickle stream section)."""

    __slots__ = ("dtype", "key", "numel", "data")

    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self.data: bytes | None = None

    def array(self) -> np.ndarray:
        assert self.data is not None, f"storage {self.key} not loaded"
        return np.frombuffer(self.data, dtype=self.dtype,
                             count=self.numel)


class _TensorStub:
    """`_rebuild_tensor_v2` output before storage bytes are available."""

    __slots__ = ("ref", "offset", "size", "stride")

    def __init__(self, ref: _StorageRef, offset: int, size, stride):
        self.ref = ref
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        base = self.ref.array()
        itemsize = base.dtype.itemsize
        if not self.size:  # 0-d tensor
            return base[self.offset:self.offset + 1].copy().reshape(())
        arr = np.lib.stride_tricks.as_strided(
            base[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride))
        return np.ascontiguousarray(arr)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    return _TensorStub(storage, storage_offset, size, stride)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _TensorStub(storage, storage_offset, size, stride)


def _rebuild_parameter(tensor, requires_grad=False, backward_hooks=None):
    return tensor


class _StorageType:
    """Marker for a typed-storage class appearing inside persistent ids."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


_SAFE_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): collections.OrderedDict,
    ("torch", "Size"): tuple,
}


class _Unpickler(pickle.Unpickler):
    """Whitelisting unpickler: tensors/storages/containers only."""

    def __init__(self, file: BinaryIO, load_storage):
        super().__init__(file, encoding="utf-8")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module in ("torch", "torch.storage") and name.endswith("Storage"):
            if name in _STORAGE_DTYPES:
                dt = _STORAGE_DTYPES[name] or _bfloat16()
                return _StorageType(dt)
            if name == "UntypedStorage":
                return _StorageType(np.dtype("<u1"))
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (not a tensor container)")

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel[, view_metadata])
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = (storage_type.dtype
                 if isinstance(storage_type, _StorageType)
                 else np.dtype("<u1"))
        view_metadata = pid[5] if len(pid) > 5 else None
        if view_metadata:
            raise pickle.UnpicklingError(
                "storage views are not supported")
        return self._load_storage(dtype, str(key), int(numel))


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _TensorStub):
        return obj.materialize()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _read_zip_pth(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")
                     and "/.data/" not in n]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl in torch zip archive")
        pkl_name = min(pkl_names, key=len)
        root = pkl_name[:-len("data.pkl")].rstrip("/")

        def load_storage(dtype, key, numel):
            ref = _StorageRef(dtype, key, numel)
            ref.data = zf.read(f"{root}/data/{key}")
            return ref

        up = _Unpickler(io.BytesIO(zf.read(pkl_name)), load_storage)
        return _materialize(up.load())


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_legacy_pth(path: str) -> Any:
    storages: Dict[str, _StorageRef] = {}

    def load_storage(dtype, key, numel):
        if key not in storages:
            storages[key] = _StorageRef(dtype, key, numel)
        return storages[key]

    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: bad legacy torch magic {magic!r}")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info (endianness, type sizes)
        obj = _Unpickler(f, load_storage).load()
        keys = pickle.load(f)
        for key in keys:
            ref = storages[str(key)]
            (numel,) = struct.unpack("<q", f.read(8))
            assert numel == ref.numel, (key, numel, ref.numel)
            nbytes = numel * ref.dtype.itemsize
            ref.data = f.read(nbytes)
            assert len(ref.data) == nbytes, f"truncated storage {key}"
    return _materialize(obj)


def read_pth(path: str) -> Any:
    """Parse a torch checkpoint into numpy arrays, torch-free.

    Returns whatever was saved (state dicts come back as OrderedDicts of
    np.ndarray).  Handles both the zip (torch >= 1.6) and the legacy
    (torch < 1.6 — the reference's published artifacts) formats.
    """
    if zipfile.is_zipfile(path):
        return _read_zip_pth(path)
    return _read_legacy_pth(path)


# --------------------------------------------------------------------
# state-dict utilities
# --------------------------------------------------------------------

def strip_module_prefix(state: Dict[str, Any]) -> Dict[str, Any]:
    """Drop nn.DataParallel 'module.' prefixes
    (reference: Human_Motion_Modelling/utils/utils.py:64-68)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state.items()}


def flatten_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """Normalize a loaded checkpoint to a flat name->array dict; unwraps
    a 'state_dict' envelope if present (utils/utils.py:77-79)."""
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint is not a state dict: {type(obj)}")
    flat = {}
    for k, v in obj.items():
        if isinstance(v, np.ndarray):
            flat[str(k)] = v
    return strip_module_prefix(flat)


# --------------------------------------------------------------------
# motion transformer: reference names -> renderloom pytree
# --------------------------------------------------------------------

def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def map_motion_params(state: Dict[str, np.ndarray]) -> Dict:
    """``model_epochNNN.pth`` state dict -> ``MotionTransformer`` params.

    Reference schema (Human_Motion_Modelling/models/transformer.py, saved
    at models/trainer.py:208-211): ``input_embed``/``joints_embed`` Linear,
    ``encoder.layers.N`` with fused-QKV ``self_attn.in_proj_weight``
    (torch nn.MultiheadAttention), ``decoder.layers.N`` with ``self_attn``
    + ``multihead_attn`` (cross), pre-norm LayerNorms, final
    ``encoder.norm``/``decoder.norm``.  renderloom keeps q/k/v projections
    separate, (in, out)-ordered kernels, and names cross-attention
    ``cross_attn`` (models/motion_transformer.py).
    """
    state = strip_module_prefix(state)
    out: Dict[str, Any] = {}

    def linear(dst: str, src: str):
        out[dst] = {"kernel": _t(state[f"{src}.weight"]),
                    "bias": state[f"{src}.bias"].copy()}

    def layernorm(dst: str, src: str):
        out[dst] = {"scale": state[f"{src}.weight"].copy(),
                    "bias": state[f"{src}.bias"].copy()}

    def attention(dst: str, src: str):
        w = state[f"{src}.in_proj_weight"]       # (3*d, d)
        b = state[f"{src}.in_proj_bias"]         # (3*d,)
        d = w.shape[1]
        assert w.shape[0] == 3 * d, f"{src}: bad in_proj {w.shape}"
        names = ("q_proj", "k_proj", "v_proj")
        blk = {}
        for i, name in enumerate(names):
            blk[name] = {"kernel": _t(w[i * d:(i + 1) * d]),
                         "bias": b[i * d:(i + 1) * d].copy()}
        blk["out_proj"] = {"kernel": _t(state[f"{src}.out_proj.weight"]),
                           "bias": state[f"{src}.out_proj.bias"].copy()}
        out[dst] = blk

    linear("input_embed", "input_embed")
    linear("joints_embed", "joints_embed")
    layernorm("encoder_norm", "encoder.norm")
    layernorm("decoder_norm", "decoder.norm")

    n_enc = 1 + max(int(k.split(".")[2]) for k in state
                    if k.startswith("encoder.layers."))
    n_dec = 1 + max(int(k.split(".")[2]) for k in state
                    if k.startswith("decoder.layers."))
    for i in range(n_enc):
        src = f"encoder.layers.{i}"
        blk: Dict[str, Any] = {}
        out[f"enc_{i}"] = blk
        attention(f"enc_{i}/self_attn", f"{src}.self_attn")
        blk["self_attn"] = out.pop(f"enc_{i}/self_attn")
        blk["ffn"] = {
            "linear1": {"kernel": _t(state[f"{src}.linear1.weight"]),
                        "bias": state[f"{src}.linear1.bias"].copy()},
            "linear2": {"kernel": _t(state[f"{src}.linear2.weight"]),
                        "bias": state[f"{src}.linear2.bias"].copy()},
        }
        blk["norm1"] = {"scale": state[f"{src}.norm1.weight"].copy(),
                        "bias": state[f"{src}.norm1.bias"].copy()}
        blk["norm2"] = {"scale": state[f"{src}.norm2.weight"].copy(),
                        "bias": state[f"{src}.norm2.bias"].copy()}
    for i in range(n_dec):
        src = f"decoder.layers.{i}"
        blk = {}
        out[f"dec_{i}"] = blk
        attention(f"dec_{i}/self_attn", f"{src}.self_attn")
        blk["self_attn"] = out.pop(f"dec_{i}/self_attn")
        attention(f"dec_{i}/cross_attn", f"{src}.multihead_attn")
        blk["cross_attn"] = out.pop(f"dec_{i}/cross_attn")
        blk["ffn"] = {
            "linear1": {"kernel": _t(state[f"{src}.linear1.weight"]),
                        "bias": state[f"{src}.linear1.bias"].copy()},
            "linear2": {"kernel": _t(state[f"{src}.linear2.weight"]),
                        "bias": state[f"{src}.linear2.bias"].copy()},
        }
        for n in ("norm1", "norm2", "norm3"):
            blk[n] = {"scale": state[f"{src}.{n}.weight"].copy(),
                      "bias": state[f"{src}.{n}.bias"].copy()}
    return out


# --------------------------------------------------------------------
# torchvision VGG19 -> perceptual-loss npz
# --------------------------------------------------------------------

def vgg19_state_to_npz(state: Dict[str, np.ndarray], npz_path: str) -> int:
    """Save a torchvision ``vgg19`` (or bare ``.features``) state dict as
    the ``vgg19_features.npz`` snapshot ``perceptual.load_torchvision_npz``
    reads (keys ``features.N.weight|bias``, OIHW kernels kept as-is — the
    loader transposes).  Returns the number of conv layers written."""
    arrays = {}
    n = 0
    for k, v in state.items():
        if not k.startswith("features."):
            k = f"features.{k}"
        if k.endswith(".weight") and v.ndim == 4:
            arrays[k] = v
            n += 1
        elif k.endswith(".bias") and v.ndim == 1:
            arrays[k] = v
    if n == 0:
        raise ValueError("no conv kernels found in VGG state dict")
    os.makedirs(os.path.dirname(npz_path) or ".", exist_ok=True)
    np.savez(npz_path, **arrays)
    return n
