"""DALI proxy for PyTorch DataLoader integration.

Reference: dali/python/nvidia/dali/plugin/pytorch/experimental/proxy/
(__init__.py:346 DALIServer). The pattern: torch DataLoader *workers* only
produce lightweight proxy references (e.g. encoded JPEG bytes); the
dali_tpu pipeline runs in the MAIN process (where the TPU lives), fed via
named external_source nodes, and its outputs are substituted into the
collated batch transparently.

    pipe = my_pipeline()            # contains fn.external_source(name="images")
    with dali_proxy.DALIServer(pipe) as server:
        dataset = MyDataset(..., transform=server.proxy)   # workers call proxy(x)
        loader = dali_proxy.DataLoader(server, dataset, batch_size=16,
                                       num_workers=2)
        for data, label in loader:       # data was produced by the pipeline
            ...
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np


class _ProxySample:
    """A worker-side reference: raw per-sample inputs for the pipeline."""

    __slots__ = ("inputs",)

    def __init__(self, inputs):
        self.inputs = tuple(np.asarray(x) for x in inputs)


class _ProxyBatch:
    """Collated proxy samples awaiting pipeline execution."""

    __slots__ = ("samples",)

    def __init__(self, samples: List[_ProxySample]):
        self.samples = samples


class DALIProxy:
    """Picklable callable handed to dataset transforms in worker processes."""

    def __init__(self, input_names: Sequence[str]):
        self._input_names = list(input_names)

    def __call__(self, *inputs):
        if len(inputs) != len(self._input_names):
            raise ValueError(
                f"proxy expects {len(self._input_names)} inputs "
                f"({self._input_names}), got {len(inputs)}")
        return _ProxySample(inputs)


class DALIServer:
    """Owns the pipeline; feeds proxy batches and substitutes outputs
    (reference DALIServer, proxy/__init__.py:346)."""

    def __init__(self, pipeline, input_names: Optional[Sequence[str]] = None):
        self._pipe = pipeline
        self._input_names = list(input_names) if input_names is not None else None

    def _names(self) -> List[str]:
        if self._input_names is None:
            self._pipe.build()  # tracing happens at build
            names = self._discover_input_names(self._pipe)
            if not names:
                raise ValueError(
                    "DALIServer pipeline needs at least one named external_source")
            self._input_names = names
        return self._input_names

    @staticmethod
    def _discover_input_names(pipeline):
        names = []
        for node in getattr(pipeline, "_traced_ops", []):
            if node.spec.schema_name == "ExternalSource" and not node.spec._extra.get("_source"):
                src = node.spec.GetArgument("source", None) if node.spec.HasArgument("source") else None
                if src is None:
                    names.append(node.instance_name)
        return names

    @property
    def proxy(self) -> DALIProxy:
        return DALIProxy(self._names())

    def __enter__(self):
        self._pipe.build()
        return self

    def __exit__(self, *exc):
        return False

    # -- batch production -------------------------------------------------------
    def _run_proxy_batch(self, pb: _ProxyBatch):
        import torch

        bs = self._pipe.max_batch_size
        n = len(pb.samples)
        if n > bs:
            raise ValueError(
                f"proxy batch of {n} exceeds pipeline batch size {bs}; "
                "use DataLoader(batch_size<=pipeline batch_size)")
        for k, name in enumerate(self._names()):
            samples = [s.inputs[k] for s in pb.samples]
            # pad to the pipeline's batch size by repeating the tail sample,
            # then trim outputs (partial final batches)
            samples = samples + [samples[-1]] * (bs - n)
            self._pipe.feed_input(name, samples)
        outputs = self._pipe.run()
        torched = []
        for tl in outputs:
            cpu = tl.as_cpu() if hasattr(tl, "as_cpu") else tl
            if cpu.is_dense_tensor():
                torched.append(torch.from_numpy(np.ascontiguousarray(cpu.as_array()[:n])))
            else:
                torched.append([torch.from_numpy(np.ascontiguousarray(cpu.at(i)))
                                for i in range(n)])
        return tuple(torched) if len(torched) > 1 else torched[0]

    def produce_data(self, obj: Any):
        """Replace every _ProxyBatch inside a collated structure with the
        pipeline outputs (reference DALIServer.produce_data)."""
        if isinstance(obj, _ProxyBatch):
            return self._run_proxy_batch(obj)
        if isinstance(obj, (list, tuple)):
            out = [self.produce_data(v) for v in obj]
            return type(obj)(out) if not isinstance(obj, tuple) else tuple(out)
        if isinstance(obj, dict):
            return {k: self.produce_data(v) for k, v in obj.items()}
        return obj


def _make_collate(base_collate):
    def collate(items):
        if items and isinstance(items[0], _ProxySample):
            return _ProxyBatch(list(items))
        if items and isinstance(items[0], (tuple, list)):
            cols = list(zip(*items))
            if isinstance(items[0], tuple) and hasattr(items[0], "_fields"):
                # namedtuple: the constructor takes one positional arg per
                # field, not a single iterable (torch default_collate
                # supports these the same way)
                return type(items[0])(*(collate(list(c)) for c in cols))
            return type(items[0])(collate(list(c)) for c in cols)
        if items and isinstance(items[0], dict):
            return {k: collate([d[k] for d in items]) for k in items[0]}
        return base_collate(items)

    return collate


class DataLoader:
    """torch DataLoader wrapper: workers collate proxy references; the main
    process runs the pipeline per batch (reference dali_proxy.DataLoader)."""

    def __init__(self, server: DALIServer, dataset, **kwargs):
        import torch.utils.data

        self._server = server
        base = torch.utils.data.default_collate
        kwargs.setdefault("collate_fn", _make_collate(base))
        self._loader = torch.utils.data.DataLoader(dataset, **kwargs)

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        for batch in self._loader:
            yield self._server.produce_data(batch)
