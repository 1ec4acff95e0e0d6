"""Declarative sync-spec config — the reference's entire "query
language" (``config.json:10-28``, consumed at ``pyCassElastic.py:49,63``)
as validated dataclasses.

The reference validates nothing at load time; a missing table is
discovered mid-run (SURVEY.md §3 EP1 step 3). Here ``load_config``
raises on malformed specs up front.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class StoreSpec:
    """One side of a sync: where the rows live and its provenance tag."""

    table: str
    source_id: str | None = None
    options: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class SyncSpec:
    """One bidirectional sync definition (reference config.json:10-28)."""

    name: str
    id_col: str
    version_col: str
    left: StoreSpec
    right: StoreSpec
    #: the human timestamp column (ISO-parsed/formatted by core/convert);
    #: NOT the incremental filter — windows filter on ``version_col``,
    #: exactly like the reference (pyCassElastic.py:205-212 filters on
    #: the version even though the flag is named ``filter_date``)
    date_col: str | None = None
    filter_date: bool = True
    ignore_same_source: bool = False
    fields_list: tuple[str, ...] | None = None
    tiebreak_cols: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        for attr in ("name", "id_col", "version_col"):
            if not getattr(self, attr):
                raise ValueError(f"SyncSpec requires a non-empty {attr!r}")


def _store(payload: dict[str, Any], key: str) -> StoreSpec:
    raw = payload.get(key)
    if not isinstance(raw, dict) or "table" not in raw:
        raise ValueError(f"sync spec missing {key}.table: {payload!r}")
    return StoreSpec(
        table=raw["table"],
        source_id=raw.get("source_id"),
        options={k: str(v) for k, v in raw.get("options", {}).items()},
    )


def parse_spec(payload: dict[str, Any]) -> SyncSpec:
    """Parse one spec dict, accepting the reference's key names
    (``cassandra``/``elasticsearch``) or neutral ``left``/``right``."""
    left_key = "left" if "left" in payload else "cassandra"
    right_key = "right" if "right" in payload else "elasticsearch"
    fields_list = payload.get("fields_list")
    return SyncSpec(
        name=payload.get("name", ""),
        id_col=payload.get("id_col", ""),
        version_col=payload.get("version_col", ""),
        date_col=payload.get("date_col"),
        filter_date=bool(payload.get("filter_date", True)),
        ignore_same_source=bool(payload.get("ignore_same_source", False)),
        fields_list=tuple(fields_list) if fields_list else None,
        tiebreak_cols=tuple(payload.get("tiebreak_cols", ())),
        left=_store(payload, left_key),
        right=_store(payload, right_key),
    )


def load_config(path: str) -> list[SyncSpec]:
    """Load and validate a JSON config file holding ``{"syncs": [...]}``
    (the reference's shape, config_ex.json:10) or a bare list of specs
    (``"sync"`` is accepted as a legacy alias)."""
    with open(path, encoding="utf-8") as fh:
        payload = json.load(fh)
    if isinstance(payload, dict):
        specs = payload.get("syncs", payload.get("sync", payload))
    else:
        specs = payload
    if not isinstance(specs, list):
        raise ValueError(f"config must hold a list of sync specs, got {type(specs)}")
    return [parse_spec(s) for s in specs]
