"""Format/plan artifact store.

The reference persists every tuning candidate's transformed metadata arrays
(the *format*) plus the generated program and its perf_result under
``data_source/<rand_id>/`` and re-runs them later (metadata_set.cc:517-571,
obtain_result.py).  TPU-native equivalent: packed-format dataclasses are
saved as one ``.npz`` (arrays) + ``.json`` (scalar fields, schedule, perf)
per artifact under the config cache_dir; Mosaic's compilation cache plays
the role of the compiled binary.

Works generically over every format dataclass in the package
(StripeFormat, NestedStripeFormat, TileFormat, SegmentFormat, SpanFormat,
RadixFormat, SegmentSpanFormat, NmFormat, BlockEllFormat,
HaloStripeFormat).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import numpy as np

from tpusparse.config import get_config

_FORMAT_CLASSES = {}


def _format_class(name: str):
    if not _FORMAT_CLASSES:
        from tpusparse.format import (NestedStripeFormat, SegmentFormat,
                                      StripeFormat, TileFormat)
        from tpusparse.kernels.block_ell import BlockEllFormat
        from tpusparse.kernels.nm_structured import NmFormat
        from tpusparse.kernels.nnz_split import SegmentSpanFormat
        from tpusparse.kernels.radix_gather import RadixFormat
        from tpusparse.kernels.span_gather import SpanFormat
        from tpusparse.dist.overlap import HaloStripeFormat

        for cls in (StripeFormat, TileFormat, SegmentFormat, SpanFormat,
                    RadixFormat, SegmentSpanFormat, NestedStripeFormat,
                    NmFormat, BlockEllFormat, HaloStripeFormat):
            _FORMAT_CLASSES[cls.__name__] = cls
    return _FORMAT_CLASSES[name]


def save_format(fmt: Any, path: str) -> None:
    """Save a packed-format dataclass as <path>.npz + <path>.json."""
    arrays = {}
    scalars = {"__class__": type(fmt).__name__}
    for f in dataclasses.fields(fmt):
        v = getattr(fmt, f.name)
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            arrays[f.name] = np.asarray(v)
        elif isinstance(v, tuple):
            scalars[f.name] = list(v)
        else:
            scalars[f.name] = v
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(scalars, f, default=str)


def load_format(path: str):
    """Load a format saved by :func:`save_format` (numpy arrays)."""
    with open(path + ".json") as f:
        scalars = json.load(f)
    cls = _format_class(scalars.pop("__class__"))
    data = dict(np.load(path + ".npz"))
    kwargs = dict(data)
    for f in dataclasses.fields(cls):
        if f.name in scalars:
            v = scalars[f.name]
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


def artifact_dir(sig: str, run_id: str | None = None) -> str:
    """data_source/<rand_id> analogue under the cache dir."""
    if run_id is None:
        run_id = time.strftime("%Y%m%d_%H%M%S")
    d = os.path.join(get_config().cache_dir, "artifacts", sig, run_id)
    os.makedirs(d, exist_ok=True)
    return d


def save_plan_artifact(sig: str, schedule_desc: dict, formats: list,
                       perf: dict | None = None, run_id: str | None = None) -> str:
    """Persist one tuning candidate: its schedule, packed formats, perf."""
    d = artifact_dir(sig, run_id)
    with open(os.path.join(d, "schedule.json"), "w") as f:
        json.dump(schedule_desc, f, indent=2, default=str)
    for i, fmt in enumerate(formats):
        save_format(fmt, os.path.join(d, f"format_{i}"))
    if perf is not None:
        with open(os.path.join(d, "perf_result.json"), "w") as f:
            json.dump(perf, f, indent=2)
    return d


def load_plan_artifact(path: str):
    """Load (schedule_desc, formats, perf) from an artifact dir."""
    with open(os.path.join(path, "schedule.json")) as f:
        sched = json.load(f)
    formats = []
    i = 0
    while os.path.exists(os.path.join(path, f"format_{i}.json")):
        formats.append(load_format(os.path.join(path, f"format_{i}")))
        i += 1
    perf = None
    pf = os.path.join(path, "perf_result.json")
    if os.path.exists(pf):
        with open(pf) as f:
            perf = json.load(f)
    return sched, formats, perf
