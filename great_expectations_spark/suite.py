"""Expectation suites — the declarative constraint layer.

Mirrors the reference's data model (SURVEY.md §1.1; reference:
``great_expectations/core/expectation_configuration.py`` and
``great_expectations/core/expectation_suite.py``, unverified upstream
citations per SURVEY.md §0): an ``ExpectationConfiguration`` is one
declarative constraint ``{expectation_type, kwargs, meta}``; an
``ExpectationSuite`` is an ordered list of configurations plus suite meta.

Both serialize to/from plain JSON so suites are storable documents, exactly
like the reference's suite files.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Iterator


def _freeze(obj: Any) -> Any:
    """Recursively convert to a hashable, deterministic representation."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    if isinstance(obj, set):
        return tuple(sorted(_freeze(v) for v in obj))
    return obj


@dataclass
class ExpectationConfiguration:
    """One declarative constraint.

    Reference parity: ``ExpectationConfiguration`` carries
    ``expectation_type`` (e.g. ``expect_column_values_to_not_be_null``),
    ``kwargs`` (domain + value kwargs, incl. ``mostly``, ``row_condition``,
    ``result_format``), and free-form ``meta``.
    """

    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    # -- identity ---------------------------------------------------------
    @property
    def id(self) -> str:
        """Deterministic id — analogous to the reference's IDDict.to_id()
        (``great_expectations/core/id_dict.py``): md5 of the canonical JSON.
        """
        payload = json.dumps(
            {"type": self.expectation_type, "kwargs": self.kwargs},
            sort_keys=True,
            default=str,
        )
        return hashlib.md5(payload.encode()).hexdigest()[:16]

    def __hash__(self) -> int:  # usable as dict key at plan time
        return hash((self.expectation_type, _freeze(self.kwargs)))

    # -- convenience accessors used throughout the planner ----------------
    @property
    def column(self) -> str | None:
        return self.kwargs.get("column")

    @property
    def mostly(self) -> float | None:
        m = self.kwargs.get("mostly")
        if m is not None and not (0.0 <= float(m) <= 1.0):
            raise ValueError(f"mostly must be within [0, 1], got {m}")
        return None if m is None else float(m)

    @property
    def row_condition(self) -> str | None:
        return self.kwargs.get("row_condition")

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
            "id": self.id,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    """Ordered list of expectation configurations + suite meta."""

    name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> ExpectationConfiguration:
        # ``meta`` is a sibling field of the configuration, not a validation
        # kwarg (reference GE excludes it from expectation identity); pop it
        # so it never leaks into ``cfg.id`` / kwargs-shaped serialization.
        meta = kwargs.pop("meta", None) or {}
        cfg = ExpectationConfiguration(
            expectation_type=expectation_type, kwargs=kwargs, meta=meta
        )
        self.expectations.append(cfg)
        return cfg

    def __iter__(self) -> Iterator[ExpectationConfiguration]:
        return iter(self.expectations)

    def __len__(self) -> int:
        return len(self.expectations)

    @property
    def suite_hash(self) -> str:
        """Deterministic hash of the full suite — used by the checkpoint
        manifest (FIXTURES.md F6 ``suite_hash``) so resumed runs only reuse
        partitions validated under the *same* suite.

        The derived ``id`` is EXCLUDED from the payload: it is itself an md5
        of (expectation_type, kwargs) already present, and including it would
        change the hash on serialization-format changes — silently
        invalidating every existing checkpoint manifest on upgrade."""
        payload = json.dumps(
            [
                {k: v for k, v in e.to_dict().items() if k != "id"}
                for e in self.expectations
            ],
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    # -- JSON io -----------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "meta": self.meta,
                "expectations": [e.to_dict() for e in self.expectations],
            },
            indent=2,
            default=str,
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        d = json.loads(s)
        return cls(
            name=d["name"],
            meta=dict(d.get("meta", {})),
            expectations=[
                ExpectationConfiguration.from_dict(e) for e in d.get("expectations", [])
            ],
        )


# ---------------------------------------------------------------------------
# evaluation parameters (reference: great_expectations/core/
# evaluation_parameters.py — ``{"$PARAMETER": "name"}`` kwargs resolved at
# validation time, e.g. a row count recorded by a previous run)
# ---------------------------------------------------------------------------

def _substitute(obj: Any, params: dict[str, Any]) -> Any:
    if isinstance(obj, dict):
        if set(obj.keys()) == {"$PARAMETER"}:
            name = obj["$PARAMETER"]
            if name not in params:
                raise KeyError(f"evaluation parameter {name!r} not supplied")
            return params[name]
        return {k: _substitute(v, params) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, params) for v in obj]
    return obj


def bind_evaluation_parameters(
    suite: ExpectationSuite, params: dict[str, Any]
) -> ExpectationSuite:
    """Return a copy of ``suite`` with every ``{"$PARAMETER": name}`` kwarg
    replaced by ``params[name]``. The bound suite has its own suite_hash, so
    checkpoint resume distinguishes runs bound to different parameters."""
    return ExpectationSuite(
        name=suite.name,
        meta=dict(suite.meta),
        expectations=[
            ExpectationConfiguration(
                expectation_type=e.expectation_type,
                kwargs=_substitute(e.kwargs, params),
                meta=dict(e.meta),
            )
            for e in suite.expectations
        ],
    )
