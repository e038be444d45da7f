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
    "map_motion_params", "map_motion_opt_state", "vgg19_state_to_npz",
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
        # Checkpoint-controlled geometry: bound-check against the storage
        # before as_strided, or a crafted record reads process memory.
        if self.offset < 0 or any(s < 0 for s in self.stride) \
                or any(n < 0 for n in self.size):
            raise ValueError(
                f"storage {self.ref.key}: negative tensor geometry "
                f"offset={self.offset} size={self.size} "
                f"stride={self.stride}")
        if not self.size:  # 0-d tensor
            if self.offset >= self.ref.numel:
                raise ValueError(
                    f"storage {self.ref.key}: 0-d offset {self.offset} "
                    f">= numel {self.ref.numel}")
            return base[self.offset:self.offset + 1].copy().reshape(())
        if min(self.size) == 0:
            return np.zeros(self.size, dtype=base.dtype)
        last = self.offset + sum(
            (n - 1) * s for n, s in zip(self.size, self.stride))
        if last >= self.ref.numel:
            raise ValueError(
                f"storage {self.ref.key}: tensor extent {last} >= "
                f"numel {self.ref.numel} (offset={self.offset} "
                f"size={self.size} stride={self.stride})")
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
        prefix = f"{root}/" if root else ""

        def load_storage(dtype, key, numel):
            ref = _StorageRef(dtype, key, numel)
            ref.data = zf.read(f"{prefix}data/{key}")
            return ref

        up = _Unpickler(io.BytesIO(zf.read(pkl_name)), load_storage)
        return _materialize(up.load())


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _NoGlobalsUnpickler(pickle.Unpickler):
    """For the legacy header/key pickles: scalars, strings and plain
    containers only — any GLOBAL opcode (the arbitrary-code vector) is
    rejected before the payload can run."""

    def find_class(self, module: str, name: str):
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} in checkpoint header")

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "persistent id not allowed in checkpoint header")


def _safe_load(f: BinaryIO) -> Any:
    return _NoGlobalsUnpickler(f, encoding="utf-8").load()


def _read_legacy_pth(path: str) -> Any:
    storages: Dict[str, _StorageRef] = {}

    def load_storage(dtype, key, numel):
        if key not in storages:
            storages[key] = _StorageRef(dtype, key, numel)
        return storages[key]

    with open(path, "rb") as f:
        magic = _safe_load(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: bad legacy torch magic {magic!r}")
        _safe_load(f)  # protocol version
        _safe_load(f)  # sys info (endianness, type sizes)
        obj = _Unpickler(f, load_storage).load()
        keys = _safe_load(f)
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


def map_motion_opt_state(opt_obj: Any, model_keys):
    """``opt_epochNNN.pth`` Adam moments -> renderloom moment pytrees.

    The reference saves/restores the motion Adam state as
    ``{'transformer': optimizer.state_dict()}``
    (``Human_Motion_Modelling/models/trainer.py:100-118,208-225``).
    torch keys the per-parameter state by position in
    ``transformer.parameters()`` — the same order as the model state
    dict's parameter keys (single param group, no buffers), so
    ``model_keys`` (the ordered key list of the matching
    ``model_epochNNN.pth``) names each slot.  Each moment kind is then a
    reference-schema state dict and maps through
    :func:`map_motion_params` into the renderloom layout.

    Returns ``(count, mu, nu, nu_max)`` — the fields of optax's
    amsgrad state (torch ``step`` / ``exp_avg`` / ``exp_avg_sq`` /
    ``max_exp_avg_sq``; both apply the same bias correction).
    """
    if isinstance(opt_obj, dict) and "transformer" in opt_obj:
        opt_obj = opt_obj["transformer"]
    if not (isinstance(opt_obj, dict) and "state" in opt_obj):
        raise ValueError("not a torch optimizer state dict "
                         "(missing 'state')")
    state = opt_obj["state"]
    order = []
    for g in opt_obj.get("param_groups", []):
        order += list(g.get("params", []))
    if not order:
        order = sorted(state)
    keys = [k for k in model_keys]
    if len(order) != len(keys):
        raise ValueError(
            f"optimizer has {len(order)} param slots but the model "
            f"checkpoint has {len(keys)} parameters — not a matching "
            "opt/model pair")

    def tree_of(kind: str):
        d = {}
        for i, pid in enumerate(order):
            slot = state[pid] if pid in state else state[str(pid)]
            d[keys[i]] = np.asarray(slot[kind])
        return map_motion_params(d)

    counts = [int(np.asarray(s["step"]).item()) for s in state.values()]
    return (max(counts) if counts else 0, tree_of("exp_avg"),
            tree_of("exp_avg_sq"), tree_of("max_exp_avg_sq"))


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


# --------------------------------------------------------------------
# renderer netG / netD: reference names -> renderloom pytrees
# --------------------------------------------------------------------

def _set(tree: Dict, path, leaf):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = leaf


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _spectral_effective(state: Dict[str, np.ndarray], src: str):
    """Resolve a torch spectral-norm conv to its effective weight.

    torch stores ``weight_orig`` + power-iteration ``weight_u/v`` and
    divides by ``sigma = u^T W v`` at every forward (eval included).  We
    bake that division in (flax SpectralNorm then re-estimates sigma ~= 1
    from the imported ``u``, so inference matches the reference)."""
    w = state[f"{src}.weight_orig"].astype(np.float64)
    u = state[f"{src}.weight_u"].astype(np.float64)
    v = state[f"{src}.weight_v"].astype(np.float64)
    sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
    w_eff = (w / sigma).astype(np.float32)
    return _conv_w(w_eff), state[f"{src}.bias"].copy(), \
        u.astype(np.float32)


def _put_sn_conv(params: Dict, stats: Dict, dst_path, state, src):
    """Spectral conv -> ``<dst>/conv/{kernel,bias}`` params +
    ``<dst>/sn/{conv/kernel/u, conv/kernel/sigma}`` batch stats (flax
    SpectralNorm variable layout)."""
    kernel, bias, u = _spectral_effective(state, src)
    _set(params, list(dst_path) + ["conv", "kernel"], kernel)
    _set(params, list(dst_path) + ["conv", "bias"], bias)
    _set(stats, list(dst_path) + ["sn", "conv/kernel/u"],
         u.reshape(1, -1))
    _set(stats, list(dst_path) + ["sn", "conv/kernel/sigma"],
         np.asarray(1.0, np.float32))


def _put_plain_conv(params: Dict, dst_path, state, src):
    _set(params, list(dst_path) + ["kernel"], _conv_w(state[f"{src}.weight"]))
    _set(params, list(dst_path) + ["bias"], state[f"{src}.bias"].copy())


def _put_instance_norm(params: Dict, dst_path, state, src):
    _set(params, list(dst_path) + ["scale"], state[f"{src}.weight"].copy())
    _set(params, list(dst_path) + ["bias"], state[f"{src}.bias"].copy())


def _indices(state: Dict, prefix: str, pattern: str) -> list:
    """Sorted distinct N where f'{prefix}{pattern}'.format(N) prefixes a
    key; pattern contains '{}'."""
    import re

    rx = re.compile(re.escape(prefix) + pattern.replace(
        "{}", r"(\d+)") + r"\.")
    found = {int(m.group(1)) for k in state
             if (m := rx.match(k)) is not None}
    return sorted(found)


def map_generator_params(state: Dict[str, np.ndarray]):
    """``netG_epochNNN.pth`` -> (params_g, stats_g) for
    ``renderloom.models.renderer.Generator``.

    Reference schema: ``Pose_Guided_Neural_Rendering/models/generator.py``
    — ``ref_embedding`` LabelEmbedder, ``down_first`` plain conv,
    ``down_N/res_N/up_N`` SPADE res blocks (``conv_block_{0,1,s}`` each
    with a SPADE ``norm.mlps.0`` affine conv), ``conv_img`` head, and the
    MaskGenerator instance ``flow_network_temp`` (dual encoder
    ``down_lbl/down_img``, ``res_flow`` CNACN blocks, ``up_flow``
    upsample+conv pairs, 1ch ``conv_mask``).  ``label_embedding`` and the
    top-level ``conv_mask`` are dead code in the reference forward
    (generator.py:196-229 comments) and are skipped.
    """
    state = strip_module_prefix(state)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # LabelEmbedder (generator.py:306-410)
    _put_sn_conv(params, stats, ["ref_embed", "conv_first"], state,
                 "ref_embedding.conv_first.layers.conv")
    for i in _indices(state, "ref_embedding.", "down_{}"):
        _put_sn_conv(params, stats, ["ref_embed", f"down_{i}"], state,
                     f"ref_embedding.down_{i}.layers.conv")

    _put_plain_conv(params, ["down_first"], state,
                    "down_first.layers.conv")

    def spade_block(dst: str, src: str):
        blk_p: Dict[str, Any] = {}
        for tag, mine in (("conv_block_0", "0"), ("conv_block_1", "1"),
                          ("conv_block_s", "_s")):
            if f"{src}.{tag}.layers.conv.weight_orig" not in state:
                continue
            _put_sn_conv(params, stats, [dst, f"conv{mine}"], state,
                         f"{src}.{tag}.layers.conv")
            _put_plain_conv(
                params, [dst, f"spade{mine}", "affine"], state,
                f"{src}.{tag}.layers.norm.mlps.0.0.layers.conv")

    for group in ("down", "res", "up"):
        for i in _indices(state, "", group + "_{}"):
            spade_block(f"{group}_{i}", f"{group}_{i}")

    _put_plain_conv(params, ["conv_img", "conv"], state,
                    "conv_img.layers.conv")

    # MaskGenerator == flow_network_temp (generator.py:415-510)
    mg = "flow_network_temp"
    for ref_name, mine in (("down_lbl", "lbl"), ("down_img", "img")):
        idxs = _indices(state, f"{mg}.", ref_name + ".{}")
        for i in idxs:
            dst = (f"mask_net/{mine}_in" if i == 0
                   else f"mask_net/{mine}_down{i - 1}").split("/")
            _put_sn_conv(params, stats, dst + ["conv"], state,
                         f"{mg}.{ref_name}.{i}.layers.conv")
            _put_instance_norm(params, dst + ["norm"], state,
                               f"{mg}.{ref_name}.{i}.layers.norm")
    for i in _indices(state, f"{mg}.", "res_flow.{}"):
        src = f"{mg}.res_flow.{i}"
        for tag, mine in (("conv_block_0", "0"), ("conv_block_1", "1"),
                          ("conv_block_s", "_s")):
            if f"{src}.{tag}.layers.conv.weight_orig" not in state:
                continue
            dst = ["mask_net", f"res{i}"]
            _put_sn_conv(params, stats, dst + [f"conv{mine}"], state,
                         f"{src}.{tag}.layers.conv")
            _put_instance_norm(params, dst + [f"norm{mine}"], state,
                               f"{src}.{tag}.layers.norm")
    up_idx = _indices(state, f"{mg}.", "up_flow.{}")
    n_up = len(up_idx)
    for k, seq_i in enumerate(sorted(up_idx)):
        # sequential [Upsample, conv]×n: param item 2k+1 is the conv for
        # decoder level (n-1-k)
        dst = ["mask_net", f"up{n_up - 1 - k}"]
        _put_sn_conv(params, stats, dst + ["conv"], state,
                     f"{mg}.up_flow.{seq_i}.layers.conv")
        _put_instance_norm(params, dst + ["norm"], state,
                           f"{mg}.up_flow.{seq_i}.layers.norm")
    _put_plain_conv(params, ["mask_net", "conv_mask", "conv", "conv"],
                    state, f"{mg}.conv_mask.0.layers.conv")
    return params, stats


def map_discriminator_params(state: Dict[str, np.ndarray]):
    """``netD_epochNNN.pth`` -> (params_d, stats_d) for
    ``renderloom.models.discriminator.DiscriminatorSet``.

    Reference: ``models/discriminator.py`` — wrapper with ``net_D`` (two
    scales), ``net_D_face``, ``net_D_hand``; each scale is layer0..K
    spectral convs with affine instance norms and a final 1ch spectral
    conv (the highest layer index) that renderloom names ``head``."""
    state = strip_module_prefix(state)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    nets = (("net_D", "net_d"), ("net_D_face", "net_d_face"),
            ("net_D_hand", "net_d_hand"))
    for ref_net, my_net in nets:
        scales = _indices(state, f"{ref_net}.", "discriminator_{}")
        for s in scales:
            src_scale = f"{ref_net}.discriminator_{s}"
            layers = _indices(state, f"{src_scale}.", "layer{}")
            if not layers:
                continue
            head = max(layers)
            for li in layers:
                src = f"{src_scale}.layer{li}.0.layers"
                if li == head:
                    dst = [my_net, f"scale{s}", "head"]
                else:
                    dst = [my_net, f"scale{s}", f"layer{li}", "conv"]
                _put_sn_conv(params, stats, dst, state, f"{src}.conv")
                if f"{src}.norm.weight" in state and li != head:
                    _put_instance_norm(
                        params, [my_net, f"scale{s}", f"layer{li}",
                                 "norm"], state, f"{src}.norm")
    return params, stats
