"""Source registry (SURVEY §2.12 U1/U2): config-driven per-source components.

The reference wires ~25 sources from JSON configs that name component
classes (fetcherClass/mapperClass/...) dynamically imported per source
(pipeline/config.py:321-458 in /root/reference). The Spark engine keeps the
same extension contract but with FUNCTIONS over DataFrames: a source is a
config dict naming dotted-path callables —

    {"name": "wikidata",
     "mapper": "my_pkg.wikidata:map_records",        # DataFrame -> DataFrame
     "loader": "my_pkg.wikidata:load",               # (spark, cfg) -> DataFrame
     "reconciler": "...", "patches": [...], "merge_order": 3, ...}

Components are resolved lazily, so configs can ship before code, and every
component is a pure DataFrame transform — executable anywhere on the
cluster, no per-source process state (the property that makes U1 mappers
parallelize freely, unlike the reference's single-threaded processes).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any, Callable

COMPONENT_KINDS = ("loader", "mapper", "reconciler", "index_loader", "tester")


def resolve(path: str) -> Callable:
    """'pkg.module:func' or 'pkg.module.func' -> the callable."""
    if ":" in path:
        mod, attr = path.split(":", 1)
    else:
        mod, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


@dataclass
class Source:
    name: str
    config: dict[str, Any] = field(default_factory=dict)
    _resolved: dict[str, Callable] = field(default_factory=dict, repr=False)

    def component(self, kind: str) -> Callable | None:
        """Resolve (and memoize) a component by kind; None if unconfigured."""
        if kind in self._resolved:
            return self._resolved[kind]
        spec = self.config.get(kind)
        if spec is None:
            return None
        fn = spec if callable(spec) else resolve(spec)
        self._resolved[kind] = fn
        return fn

    @property
    def merge_order(self) -> int:
        return int(self.config.get("merge_order", 100))


class SourceRegistry:
    def __init__(self) -> None:
        self._sources: dict[str, Source] = {}

    def register(self, name: str, **config: Any) -> Source:
        src = Source(name, config)
        self._sources[name] = src
        return src

    def register_config(self, cfg: dict[str, Any]) -> Source:
        cfg = dict(cfg)
        return self.register(cfg.pop("name"), **cfg)

    def get(self, name: str) -> Source:
        return self._sources[name]

    def __contains__(self, name: str) -> bool:
        return name in self._sources

    def names(self) -> list[str]:
        return sorted(self._sources)

    def merge_order_map(self) -> dict[str, int]:
        """The merge_order dict consumed by pipeline.merge_records."""
        return {n: s.merge_order for n, s in self._sources.items()}

    def merge_hooks_map(self) -> dict[str, dict]:
        """P5: {source: {should_merge_into/should_merge_from: fn}} for
        merge_by_yuid(vetoes=...) — sources without hooks are omitted
        (default-consent, process/base/mapper.py:276-280)."""
        out: dict[str, dict] = {}
        for n, s in self._sources.items():
            hooks = {
                kind: fn
                for kind in ("should_merge_into", "should_merge_from")
                if (fn := s.component(kind)) is not None
            }
            if hooks:
                out[n] = hooks
        return out

    def schedule_order(self, size_estimates: dict[str, int]) -> list[str]:
        """W5 (run-reconcile.py:83-85): smallest-source-first job ordering —
        small sources finish and free capacity while the big ones stream.
        Unknown sizes sort last; name tiebreak keeps the order stable."""
        return sorted(
            self._sources,
            key=lambda n: (size_estimates.get(n, float("inf")), n),
        )


REGISTRY = SourceRegistry()
