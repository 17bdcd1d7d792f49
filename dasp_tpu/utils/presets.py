"""Preset serialization: save/load configured processors with parameters.

The reference has no preset story — every example rebuilds its chain in
code and learned parameters die with the process. Here a configured
:class:`~dasp_tpu.modules.Processor` (including a whole
:class:`~dasp_tpu.modules.Chain`) plus its learned normalized parameter
tensor round-trips through one human-readable JSON file::

    chain = Chain([ParametricEQ(sr), Compressor(sr), Gain(sr)])
    save_preset("mastering.json", chain, params)     # params: (bs, N) or (N,)
    chain2, params2 = load_preset("mastering.json")
    y = chain2.process_normalized(x, params2, clip_params=True)

The file stores the constructor spec of every processor (recorded by
``Processor.__init_subclass__``), the normalized parameter matrix, and —
purely for human inspection — the denormalized values by name. Loading
reconstructs from the constructor spec, so custom ranges, filter
methods, smoother choices etc. survive.

Only JSON-able constructor arguments serialize; passing a processor
configured with a callable (e.g. a custom ``ir_conv_fn``) raises with
the offending argument named. User-defined Processor subclasses load by
passing ``extra_types=[MyProcessor]``.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["save_preset", "load_preset", "processor_to_config",
           "processor_from_config"]

_FORMAT = "dasp_tpu.preset.v1"


def _serialize_value(v, where: str):
    from dasp_tpu.modules import Processor

    if isinstance(v, Processor):
        return {"__processor__": processor_to_config(v)}
    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (list, tuple)):
        return [_serialize_value(x, where) for x in v]
    if isinstance(v, dict):
        return {str(k): _serialize_value(x, where) for k, x in v.items()}
    raise TypeError(
        f"preset cannot serialize constructor argument {where}={v!r} "
        f"(type {type(v).__name__}); rebuild this processor in code and "
        f"apply the preset's parameters instead"
    )


def _deserialize_value(v, registry: Dict[str, type]):
    if isinstance(v, dict):
        if "__processor__" in v:
            return processor_from_config(v["__processor__"], registry=registry)
        return {k: _deserialize_value(x, registry) for k, x in v.items()}
    if isinstance(v, list):
        return [_deserialize_value(x, registry) for x in v]
    return v


def processor_to_config(proc) -> dict:
    """Configured processor -> JSON-able constructor spec."""
    spec = getattr(proc, "_init_spec", None)
    if spec is None:
        raise TypeError(
            f"{type(proc).__name__} records no constructor spec "
            f"(is it a dasp_tpu.modules.Processor subclass?)"
        )
    name, args, kwargs = spec
    return {
        "type": name,
        "args": [_serialize_value(a, f"{name}(arg {i})")
                 for i, a in enumerate(args)],
        "kwargs": {k: _serialize_value(v, f"{name}({k}=)")
                   for k, v in kwargs.items()},
    }


def _default_registry(extra_types: Optional[Sequence[type]] = None) -> Dict[str, type]:
    from dasp_tpu import modules

    reg = {
        name: obj for name, obj in vars(modules).items()
        if isinstance(obj, type) and issubclass(obj, modules.Processor)
    }
    for t in extra_types or ():
        reg[t.__name__] = t
    return reg


def processor_from_config(cfg: dict, registry: Optional[Dict[str, type]] = None,
                          extra_types: Optional[Sequence[type]] = None):
    """Constructor spec -> live processor instance."""
    if registry is None:
        registry = _default_registry(extra_types)
    cls = registry.get(cfg["type"])
    if cls is None:
        raise KeyError(
            f"unknown processor type {cfg['type']!r}; pass extra_types=[...] "
            f"for processor classes defined outside dasp_tpu.modules"
        )
    args = [_deserialize_value(a, registry) for a in cfg.get("args", [])]
    kwargs = {k: _deserialize_value(v, registry)
              for k, v in cfg.get("kwargs", {}).items()}
    return cls(*args, **kwargs)


def _denormalized_view(proc, params: np.ndarray) -> List[Dict[str, float]]:
    """Per-batch-item {param_name: denormalized value} — for humans."""
    rows = []
    for b in range(params.shape[0]):
        row = {}
        for i, (name, (lo, hi)) in enumerate(proc.param_ranges.items()):
            row[name] = float(lo + (hi - lo) * float(params[b, i]))
        rows.append(row)
    return rows


def save_preset(path: str, processor, params=None,
                metadata: Optional[dict] = None) -> None:
    """Write a processor (or chain) and optional parameters to JSON.

    Args:
        path: output file.
        processor: any configured Processor/Chain.
        params: normalized parameters on (0, 1) — shape (num_params,) or
            (bs, num_params); numpy/jax arrays both accepted.
        metadata: free-form JSON-able dict (e.g. {"song": ..., "loss": ...}).
    """
    doc = {
        "format": _FORMAT,
        "processor": processor_to_config(processor),
        "sample_rate": int(processor.sample_rate),
        "param_names": list(processor.param_ranges.keys()),
    }
    if params is not None:
        p = np.asarray(params, dtype=np.float64)
        if p.ndim == 1:
            p = p[None, :]
        if p.ndim != 2 or p.shape[1] != processor.num_params:
            raise ValueError(
                f"params must have {processor.num_params} columns for this "
                f"processor, got shape {tuple(np.asarray(params).shape)}"
            )
        doc["params_normalized"] = p.tolist()
        doc["params_denormalized"] = _denormalized_view(processor, p)
    if metadata is not None:
        doc["metadata"] = metadata
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def load_preset(path: str, extra_types: Optional[Sequence[type]] = None
                ) -> Tuple[object, Optional[np.ndarray]]:
    """Read a preset -> (processor, normalized params float32 or None)."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != _FORMAT:
        raise ValueError(
            f"{path} is not a dasp_tpu preset (format={doc.get('format')!r})"
        )
    proc = processor_from_config(doc["processor"], extra_types=extra_types)
    params = None
    if "params_normalized" in doc:
        params = np.asarray(doc["params_normalized"], dtype=np.float32)
        if params.shape[1] != proc.num_params:
            raise ValueError(
                f"preset carries {params.shape[1]} parameters but the "
                f"reconstructed processor expects {proc.num_params}"
            )
    return proc, params
