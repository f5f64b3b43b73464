"""Dataset readers.

Reference framework: ``dali/operators/reader/reader_op.h:57`` (DataReader with a
prefetch thread + double-buffered batch queue) and ``reader/loader/loader.h:67``
(Loader base: shuffling buffer ``:79``, shard math ``:84-103``). Our executor runs
the whole host program on one ordered host-stage thread with sample-level fan-out,
so the reader needs no private prefetch thread: the shuffling-buffer + shard
semantics live in :class:`IndexedLoader`, and sample *payload* reads fan out to the
thread pool.

Shard math is kept identical to the reference (``loader.h:84-103`` and
``docs/advanced_topics_sharding.rst:63-74``)::

    start(shard)  = floor(shard_id * N / num_shards)
    end(shard)    = floor((shard_id+1) * N / num_shards)

with shard rotation across epochs unless ``stick_to_shard``, and
``pad_last_batch`` repeating the last sample so all shards step the same number of
iterations.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import HostBatch
from .base import HostCtx, ReaderOperator


class IndexedLoader:
    """Deterministic, checkpointable sample-index stream with DALI shard semantics.

    The shuffling buffer holds *indices*; payload I/O happens later, in parallel.
    """

    def __init__(
        self,
        num_samples_fn,
        shard_id: int,
        num_shards: int,
        random_shuffle: bool,
        initial_fill: int,
        stick_to_shard: bool,
        pad_last_batch: bool,
        batch_size: int,
        seed: int,
        shuffle_after_epoch: bool = False,
        shuffle_after_epoch_seed: int = -1,
    ):
        self._num_samples_fn = num_samples_fn
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.random_shuffle = random_shuffle
        self.initial_fill = max(1, initial_fill) if random_shuffle else 1
        self.stick_to_shard = stick_to_shard
        self.pad_last_batch = pad_last_batch
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle_after_epoch = shuffle_after_epoch
        # dedicated permutation seed (reference shuffle_after_epoch_seed):
        # readers sharing it see the SAME per-epoch global order
        self.shuffle_seed = shuffle_after_epoch_seed if shuffle_after_epoch_seed >= 0 else seed

        self._n = None
        self._epoch = 0
        self._pos = 0  # position within current epoch's shard
        self._buffer: List[int] = []
        self._rng = np.random.Generator(np.random.Philox(key=np.uint64(seed & (2**63 - 1))))
        self._virtual_shard = shard_id
        self._perm_cache = {}

    # -- shard math (reference loader.h:84-103) ---------------------------------
    @property
    def num_samples(self) -> int:
        if self._n is None:
            self._n = self._num_samples_fn()
        return self._n

    def shard_bounds(self, shard: int):
        n = self.num_samples
        start = shard * n // self.num_shards
        end = (shard + 1) * n // self.num_shards
        return start, end

    @property
    def shard_size(self) -> int:
        start, end = self.shard_bounds(self.shard_id)
        return end - start

    @property
    def shard_size_padded(self) -> int:
        if not self.pad_last_batch:
            return self.shard_size
        # all shards padded to the max shard size rounded up to batch (loader.h)
        n = self.num_samples
        max_shard = -(-n // self.num_shards)
        return -(-max_shard // self.batch_size) * self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Global sample order for an epoch (identity, or a global permutation
        when shuffle_after_epoch — reference file reader's shuffle_after_epoch)."""
        if not self.shuffle_after_epoch:
            return None
        if epoch not in self._perm_cache:
            rng = np.random.Generator(
                np.random.Philox(key=np.array([self.shuffle_seed, epoch], dtype=np.uint64))
            )
            self._perm_cache = {epoch: rng.permutation(self.num_samples)}
        return self._perm_cache[epoch]

    def _raw_index(self, epoch: int, pos_in_shard: int) -> int:
        shard = self._virtual_shard if self.stick_to_shard else (self.shard_id + epoch) % self.num_shards
        start, end = self.shard_bounds(shard)
        size = end - start
        if self.pad_last_batch and pos_in_shard >= size:
            pos_in_shard = size - 1  # repeat last sample
        idx = start + pos_in_shard
        order = self._epoch_order(epoch)
        return int(order[idx]) if order is not None else idx

    def _advance(self):
        """Next (epoch, index) in sequential shard order, wrapping epochs.

        The per-epoch limit is the size of the shard ACTUALLY read this epoch
        (the rotated shard without ``stick_to_shard``) — uneven shards have
        different sizes, and using the reader's own shard size would bleed
        reads across shard boundaries (reference Loader::Reset recomputes
        bounds for the virtual shard, loader.h:84-103)."""
        shard = self._virtual_shard if self.stick_to_shard else (
            (self.shard_id + self._epoch) % self.num_shards)
        if self.pad_last_batch:
            limit = self.shard_size_padded  # uniform across shards (max shard)
        else:
            start, end = self.shard_bounds(shard)
            limit = end - start
        if self._pos >= limit:
            self._pos = 0
            self._epoch += 1
        idx = self._raw_index(self._epoch, self._pos)
        self._pos += 1
        return idx

    def read_index(self) -> int:
        """Pop one sample index through the shuffling buffer (loader.h:228-272)."""
        if not self.random_shuffle:
            return self._advance()
        while len(self._buffer) < self.initial_fill:
            self._buffer.append(self._advance())
        k = int(self._rng.integers(0, len(self._buffer)))
        idx = self._buffer[k]
        self._buffer[k] = self._advance()
        return idx

    # -- checkpointing ------------------------------------------------------------
    def save_state(self) -> dict:
        st = self._rng.bit_generator.state
        return {
            "epoch": self._epoch,
            "pos": self._pos,
            "buffer": list(self._buffer),
            "rng_counter": st["state"]["counter"].tolist() if isinstance(st["state"], dict) else None,
            "rng_state": _jsonable_rng_state(st),
        }

    def restore_state(self, state: dict):
        self._epoch = int(state["epoch"])
        self._pos = int(state["pos"])
        self._buffer = [int(i) for i in state["buffer"]]
        if state.get("rng_state"):
            self._rng.bit_generator.state = _unjsonable_rng_state(state["rng_state"])


def _jsonable_rng_state(st):
    out = dict(st)
    inner = dict(st["state"])
    inner["counter"] = [int(x) for x in inner["counter"]]
    inner["key"] = [int(x) for x in inner["key"]]
    out["state"] = inner
    out["buffer"] = [int(x) for x in st.get("buffer", [])]
    return out


def _unjsonable_rng_state(st):
    out = dict(st)
    inner = dict(st["state"])
    inner["counter"] = np.array(inner["counter"], dtype=np.uint64)
    inner["key"] = np.array(inner["key"], dtype=np.uint64)
    out["state"] = inner
    out["buffer"] = np.array(out.get("buffer", []), dtype=np.uint64)
    return out


class BaseReader(ReaderOperator):
    """Shared reader plumbing: lazily builds the dataset index + loader."""

    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._loader: Optional[IndexedLoader] = None
        self._pending_state = None

    def _build_index(self):
        raise NotImplementedError

    def _read_payload(self, index: int):
        """Read one sample's payload; runs on the sample thread pool."""
        raise NotImplementedError

    def _payload_layouts(self):
        return [""]

    def _loader_kwargs(self):
        spec = self.spec
        seed = spec.GetArgument("seed", -1)
        if seed is None or seed < 0:
            seed = self.pipeline.seed + self.op_id
        return dict(
            shard_id=spec.GetArgument("shard_id", 0),
            num_shards=spec.GetArgument("num_shards", 1),
            random_shuffle=spec.GetArgument("random_shuffle", False),
            initial_fill=spec.GetArgument("initial_fill", 1024),
            stick_to_shard=spec.GetArgument("stick_to_shard", False),
            pad_last_batch=spec.GetArgument("pad_last_batch", False),
            batch_size=self.pipeline.max_batch_size,
            seed=seed,
            shuffle_after_epoch=bool(spec.GetArgument("shuffle_after_epoch", False)),
            shuffle_after_epoch_seed=int(spec.GetArgument("shuffle_after_epoch_seed", -1)),
        )

    def _ensure_loader(self):
        if self._loader is None:
            self._build_index()
            self._loader = IndexedLoader(self._num_samples, **self._loader_kwargs())
            if self._pending_state is not None:
                self._loader.restore_state(self._pending_state)
                self._pending_state = None

    def _num_samples(self):
        raise NotImplementedError

    def _source_info(self, index: int):
        """Per-sample origin string (reference source-info propagation,
        operator.h GetSourceInfo); None when the reader has no natural one."""
        return None

    def run_batch(self, ctx: HostCtx, *unused):
        self._ensure_loader()
        indices = [self._loader.read_index() for _ in range(ctx.batch_size)]
        return self._dense_batch_from(ctx, indices)

    def _dense_batch_from(self, ctx: HostCtx, indices):
        """Assemble the dense HostBatch outputs for already-consumed loader
        ``indices``. Split out of run_batch so a staged fast path that
        discovers mid-batch it cannot proceed (e.g. the video YUV wire
        hitting a mid-stream pixel-format change) can re-decode the SAME
        samples densely instead of dropping them."""
        payloads = ctx.map_samples(lambda i: self._read_payload(indices[i]), len(indices))
        n_out = len(payloads[0]) if isinstance(payloads[0], tuple) else 1
        layouts = self._payload_layouts()
        infos = [self._source_info(i) for i in indices]
        if all(x is None for x in infos):
            infos = None
        outs = []
        for j in range(n_out):
            samples = [(p[j] if isinstance(p, tuple) else p) for p in payloads]
            outs.append(HostBatch(samples, layout=layouts[j] if j < len(layouts) else "",
                                  source_info=infos if j == 0 else None))
        return outs

    def reader_meta(self):
        self._ensure_loader()
        ld = self._loader
        return {
            "epoch_size": ld.num_samples,
            "epoch_size_padded": ld.shard_size_padded * ld.num_shards
            if ld.pad_last_batch
            else ld.num_samples,
            "number_of_shards": ld.num_shards,
            "shard_id": ld.shard_id,
            "pad_last_batch": 1 if ld.pad_last_batch else 0,
            "stick_to_shard": 1 if ld.stick_to_shard else 0,
        }

    def save_state(self):
        if self._loader is None:
            return {"loader": self._pending_state} if self._pending_state else None
        return {"loader": self._loader.save_state()}

    def restore_state(self, state):
        inner = state.get("loader") if state else None
        if inner is None:
            return
        if self._loader is not None:
            self._loader.restore_state(inner)
        else:
            self._pending_state = inner


# ====================== readers.File =========================================================

DALI_SCHEMA("readers.File").DocStr(
    """Reads (file, label) pairs from a directory tree, an explicit file list, or
    ``files``/``labels`` arguments (reference ``reader/file_label_loader.cc``,
    schema ``readers__File``). Outputs: (encoded bytes [uint8], label [int32])."""
).NumInput(0).NumOutput(2).Devices("cpu").MakeReader().AddOptionalArg(
    "file_root", ArgType.STRING, "Directory with class subdirectories.", None
).AddOptionalArg(
    "file_list", ArgType.STRING, "Path to a 'filename label' list file.", None
).AddOptionalArg(
    "files", ArgType.STRING_VEC, "Explicit list of file paths.", None
).AddOptionalArg(
    "labels", ArgType.INT_VEC, "Labels matching `files`.", None
).AddOptionalArg(
    "file_filters", ArgType.STRING_VEC, "Glob filters for file discovery.",
    ["*.jpg", "*.jpeg", "*.png", "*.bmp", "*.tif", "*.tiff", "*.pnm", "*.ppm", "*.pgm", "*.pbm", "*.jp2", "*.webp"],
).AddOptionalArg(
    "case_sensitive_filter", ArgType.BOOL, "Case-sensitive glob matching.", False
)


@register_operator("readers.File", "cpu")
class FileReader(BaseReader):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._files: List[str] = None
        self._labels: List[int] = None

    def _build_index(self):
        if self._files is not None:
            return
        spec = self.spec
        files = spec.GetArgument("files", None)
        file_list = spec.GetArgument("file_list", None)
        file_root = spec.GetArgument("file_root", None)
        if files:
            labels = spec.GetArgument("labels", None)
            self._files = [
                os.path.join(file_root, f) if file_root and not os.path.isabs(f) else f for f in files
            ]
            self._labels = list(labels) if labels else list(range(len(files)))
        elif file_list:
            self._files, self._labels = [], []
            base = file_root or os.path.dirname(os.path.abspath(file_list))
            with open(file_list) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    path, _, label = line.rpartition(" ")
                    self._files.append(path if os.path.isabs(path) else os.path.join(base, path))
                    self._labels.append(int(label))
        elif file_root:
            # discovery: sorted subdirs = labels (reference discover_files.cc;
            # s3:// roots via the minimal SigV4 client, discover_files_s3.cc)
            import fnmatch

            filters = spec.GetArgument("file_filters")
            case_sensitive = spec.GetArgument("case_sensitive_filter", False)
            self._files, self._labels = [], []
            if file_root.startswith("s3://"):
                from ..import _s3

                uris = sorted(_s3.list_uris(file_root))
                root_prefix = file_root.rstrip("/") + "/"
                match = fnmatch.fnmatchcase if case_sensitive else fnmatch.fnmatch
                # label indices enumerate ALL subdirs (matching files or not),
                # exactly like the local os.listdir path — otherwise labels
                # diverge between local and s3 copies of the same dataset
                subdirs = set()
                by_dir = {}
                for uri in uris:
                    rel = uri[len(root_prefix):]
                    sub, _, fname = rel.partition("/")
                    if not fname:
                        continue
                    subdirs.add(sub)
                    if "/" in fname:
                        continue  # only one level of label dirs, like local
                    name = fname if case_sensitive else fname.lower()
                    if any(match(name, pat) for pat in filters):
                        by_dir.setdefault(sub, []).append(uri)
                for label, sub in enumerate(sorted(subdirs)):
                    for uri in sorted(by_dir.get(sub, [])):
                        self._files.append(uri)
                        self._labels.append(label)
                if not self._files:
                    raise ValueError("readers.file found no files")
                return
            subdirs = sorted(
                d for d in os.listdir(file_root) if os.path.isdir(os.path.join(file_root, d))
            )
            match = fnmatch.fnmatchcase if case_sensitive else fnmatch.fnmatch
            for label, sub in enumerate(subdirs):
                subpath = os.path.join(file_root, sub)
                for fname in sorted(os.listdir(subpath)):
                    name = fname if case_sensitive else fname.lower()
                    if any(match(name, pat) for pat in filters):
                        self._files.append(os.path.join(subpath, fname))
                        self._labels.append(label)
        else:
            raise ValueError("readers.file requires file_root, file_list, or files")
        if not self._files:
            raise ValueError("readers.file found no files")

    def _num_samples(self):
        return len(self._files)

    # Cap on live mappings (vm.max_map_count is ~65530 by default); beyond it
    # the oldest mappings are dropped and close when their consumers do.
    _MMAP_CAP = 32768

    def _read_payload(self, index: int):
        path = self._files[index]
        if path.startswith("s3://"):
            from .. import _s3

            data = np.frombuffer(_s3.read_bytes(path), dtype=np.uint8)
        elif not self.spec.GetArgument("dont_use_mmap", False):
            data = self._mmap_payload(path)
        else:
            with open(path, "rb") as f:
                data = np.frombuffer(f.read(), dtype=np.uint8)
        label = np.array([self._labels[index]], dtype=np.int32)
        return data, label

    def _mmap_payload(self, path: str) -> np.ndarray:
        import mmap as _mmaplib

        cache = getattr(self, "_mmaps", None)
        if cache is None:
            cache = self._mmaps = {}
        mm = cache.get(path)
        if mm is None:
            with open(path, "rb") as f:
                try:
                    mm = _mmaplib.mmap(f.fileno(), 0, access=_mmaplib.ACCESS_READ)
                except (ValueError, OSError):  # empty file / unmappable fs
                    return np.frombuffer(f.read(), dtype=np.uint8)
            if len(cache) >= self._MMAP_CAP:
                # drop (don't close) the oldest half; refcounts finish them.
                # pop() tolerates concurrent eviction — _read_payload runs on
                # the sample pool, and two threads may race through here
                for k in list(cache)[: self._MMAP_CAP // 2]:
                    cache.pop(k, None)
            cache[path] = mm
        return np.frombuffer(mm, dtype=np.uint8)

    def _source_info(self, index: int):
        return self._files[index]
