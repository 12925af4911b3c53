"""Torch-free reader for PyTorch ``.pth`` checkpoints (zip format).

BlinkDL RWKV checkpoints are plain ``torch.save(state_dict)`` archives: a
zip containing ``<name>/data.pkl`` (a pickle whose tensors are persistent
references) plus one raw little-endian buffer per storage under
``<name>/data/<key>``. We parse that directly with ``pickle`` + ``zipfile``
+ numpy (bf16 via ml_dtypes) — no torch import, so the serving/runtime
images stay torch-free. Falls back to ``torch.load`` only for legacy
non-zip files.

Also implements the reference's architecture sniffing
(src/model_ext.py:29-139): n_layer/n_embd/dim_att/dim_ffn/n_head/
head_size/version (5 / 5.1 / 5.2 / 6) inferred from state-dict key shapes.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, Tuple

import numpy as np

try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}


class _StorageType:
    def __init__(self, name):
        self.name = name


class _TorchUnpickler(pickle.Unpickler):
    """Resolves the handful of torch globals a state_dict pickle needs."""

    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch" and name == "Size":
            return tuple
        # torch dtype objects (e.g. torch.bfloat16) appear in some pickles
        if module == "torch":
            return name
        raise pickle.UnpicklingError(
            f"refusing to load global {module}.{name} from checkpoint"
        )

    def persistent_load(self, pid: Tuple) -> np.ndarray:
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = _STORAGE_DTYPES.get(
            storage_type.name if isinstance(storage_type, _StorageType) else storage_type
        )
        if dtype is None:
            raise pickle.UnpicklingError(
                f"unsupported storage type {storage_type!r}"
            )
        return self._load_storage(str(key), dtype, int(numel))


def _rebuild_tensor_v2(
    storage: np.ndarray,
    storage_offset: int,
    size: Tuple[int, ...],
    stride: Tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    if len(size) == 0:
        return storage[storage_offset].copy()
    itemsize = storage.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return np.ascontiguousarray(arr)


def load_torch_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict as {key: numpy array} without torch."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, np.ndarray] = {}

        def load_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            cache_key = f"{key}:{dtype}"
            if cache_key not in storages:
                raw = zf.read(f"{prefix}data/{key}")
                storages[cache_key] = np.frombuffer(raw, dtype=dtype, count=numel)
            return storages[cache_key]

        with zf.open(pkl_name) as f:
            obj = _TorchUnpickler(io.BytesIO(f.read()), load_storage).load()
    if not isinstance(obj, dict):
        raise ValueError(f"{path} did not contain a state dict")
    return obj


def save_torch_pth(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write a torch-loadable zip checkpoint (the torch.save wire format)
    so checkpoints round-trip back to the reference ecosystem — torch-free,
    by emitting the data.pkl pickle stream opcode-by-opcode."""
    rev_dtypes = {v: k for k, v in _STORAGE_DTYPES.items() if v is not None}
    entries = [(k, np.ascontiguousarray(v)) for k, v in state_dict.items()]

    out = io.BytesIO()
    w = out.write

    def put_int(n: int):
        if 0 <= n < 256:
            w(b"K" + bytes([n]))                      # BININT1
        elif -(2**31) <= n < 2**31:
            w(b"J" + n.to_bytes(4, "little", signed=True))  # BININT
        else:
            raise ValueError(n)

    def put_str(s: str):
        b = s.encode("utf-8")
        w(b"X" + len(b).to_bytes(4, "little") + b)    # BINUNICODE

    def put_tuple(emitters):
        w(b"(")                                       # MARK
        for e in emitters:
            e()
        w(b"t")                                       # TUPLE

    w(b"\x80\x02")                                    # PROTO 2
    w(b"}")                                           # EMPTY_DICT (state dict)
    w(b"(")                                           # MARK for SETITEMS
    for idx, (key, arr) in enumerate(entries):
        if arr.dtype not in rev_dtypes:
            raise ValueError(f"unsupported dtype {arr.dtype} for {key}")
        put_str(key)
        # torch._utils._rebuild_tensor_v2(
        #     storage_pid, 0, shape, stride, False, OrderedDict())
        w(b"ctorch._utils\n_rebuild_tensor_v2\n")     # GLOBAL
        stride = tuple(s // arr.dtype.itemsize for s in arr.strides)
        put_tuple([
            lambda: (
                put_tuple([
                    lambda: put_str("storage"),
                    lambda: w(
                        b"ctorch\n"
                        + rev_dtypes[arr.dtype].encode() + b"\n"
                    ),
                    lambda: put_str(str(idx)),
                    lambda: put_str("cpu"),
                    lambda: put_int(arr.size),
                ]),
                w(b"Q"),                              # BINPERSID
            ),
            lambda: put_int(0),
            lambda: put_tuple([functools_partial_int(put_int, d) for d in arr.shape]),
            lambda: put_tuple([functools_partial_int(put_int, s) for s in stride]),
            lambda: w(b"\x89"),                       # NEWFALSE
            lambda: w(b"ccollections\nOrderedDict\n)R"),  # OrderedDict()
        ])
        w(b"R")                                       # REDUCE
    w(b"u")                                           # SETITEMS
    w(b".")                                           # STOP

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", out.getvalue())
        for idx, (_k, arr) in enumerate(entries):
            zf.writestr(f"archive/data/{idx}", arr.tobytes())
        zf.writestr("archive/version", "3\n")


def functools_partial_int(fn, value):
    return lambda: fn(value)


def sniff_model_config(state_dict: Dict[str, np.ndarray], **overrides):
    """Infer a ModelConfig from state-dict shapes (the reference's
    load_ckpt_and_parse_args rules, src/model_ext.py:93-139)."""
    from rwkv_lm_ext_tpu.config import ModelConfig

    sd = strip_prefix(state_dict)
    n_embd = sd["emb.weight"].shape[1]
    vocab_size = sd["emb.weight"].shape[0]
    dim_att = sd["blocks.0.att.key.weight"].shape[0]
    dim_ffn = sd["blocks.0.ffn.key.weight"].shape[0]
    n_layer, version, n_head = 0, 4.0, 64
    for key in sd:
        if key.startswith("blocks."):
            n_layer = max(n_layer, int(key.split(".")[1]) + 1)
        if "ln_x" in key:
            version = max(5.0, version)
        if "gate.weight" in key:
            version = max(5.1, version)
        if int(version) == 5 and "att.time_decay" in key:
            n_head = sd[key].shape[0]
            if sd[key].ndim > 1 and sd[key].shape[1] > 1:
                version = max(5.2, version)
        if "time_maa" in key:
            version = max(6.0, version)
        if int(version) == 6 and "time_faaaa" in key:
            n_head = sd[key].shape[0]
    if version < 5:
        n_head = 1  # v4 has no heads; keep dim_att % head_size == 0
    kwargs = dict(
        n_layer=n_layer,
        n_embd=n_embd,
        vocab_size=vocab_size,
        dim_att=dim_att,
        dim_ffn=dim_ffn,
        head_size=dim_att // n_head,
        version=version,
    )
    kwargs.update(overrides)
    return ModelConfig(**kwargs)


def strip_prefix(
    state_dict: Dict[str, np.ndarray], prefix: str = "rwkvModel."
) -> Dict[str, np.ndarray]:
    """Drop the wrapper prefix written by the reference's task models
    (src/model_ext.py:35-40)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }
