"""DP release accounting: a per-relation epsilon ledger and an
auditable release manifest.

The DP primitives (operators/privacy.py) are each a standalone epsilon
spend, and their docstrings state the composition rules a caller must
track by hand: every fresh-seed re-release of the same relation adds
epsilon (sequential composition — and IS the averaging attack when
unintentional), an identical re-release is free (same bytes), and the
same seed pushed through two different noise tables over the same
uniform draw lets a reader difference the two releases and strip the
noise almost entirely. This module turns those rules into enforced
accounting: a :class:`DPLedger` validates each release against
everything already released in the run, warns on the legal-but-costly
patterns, REFUSES the correlated-noise one, and emits a manifest
(query, epsilon, seed, adjacency, per-relation totals) alongside the
release — the privacy counterpart of the reference's export statistics
report (main.go:177-191: the reference prints what an export did; a DP
deployment must also print what budget it spent).

Driver-side pure Python over release METADATA only — never touches
data, adds zero plan nodes; scale-independent by construction.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Any

VALID_KINDS = ("count", "sum", "avg", "user_count")


class DPBudgetError(ValueError):
    """A release combination the ledger refuses outright."""


class DPReleaseWarning(UserWarning):
    """A legal release pattern with a privacy cost the caller should
    see: epsilon accumulation on a re-released relation, or seed reuse
    that correlates noise draws across releases."""


@dataclass(frozen=True)
class ReleaseSpec:
    """One configured DP release (config ``privacy.releases[]`` entry)."""

    name: str
    table: str
    kind: str  # count | sum | avg | user_count
    group_by: tuple[str, ...]
    epsilon: float
    seed: str
    value: str = ""  # sum/avg
    bound: int = 0  # sum/avg
    entity: str = ""  # user_count
    domain: tuple | None = None  # count only: public key list (densify)
    bin_width: int = 0  # count only: histogram over integer-width bins

    @classmethod
    def parse(cls, raw: dict[str, Any], index: int = 0) -> "ReleaseSpec":
        if not isinstance(raw, dict):
            raise DPBudgetError(
                f"privacy.releases[{index}] must be a mapping, got "
                f"{type(raw).__name__}"
            )
        name = str(raw.get("name") or f"release_{index}")
        table = str(raw.get("table", "") or "")
        kind = str(raw.get("kind", "") or "")
        if not table:
            raise DPBudgetError(f"release {name!r} requires 'table'")
        if kind not in VALID_KINDS:
            raise DPBudgetError(
                f"release {name!r}: kind must be one of "
                f"{', '.join(VALID_KINDS)}, got {kind!r}"
            )
        gb = raw.get("group_by") or []
        if isinstance(gb, str):
            gb = [gb]
        if not gb:
            raise DPBudgetError(f"release {name!r} requires 'group_by'")
        try:
            epsilon = float(raw.get("epsilon", 1.0))
        except (TypeError, ValueError):
            raise DPBudgetError(
                f"release {name!r}: epsilon must be a number"
            ) from None
        if epsilon <= 0:
            raise DPBudgetError(
                f"release {name!r}: epsilon must be positive, got {epsilon}"
            )
        seed = str(raw.get("seed", "") or "")
        if not seed:
            raise DPBudgetError(
                f"release {name!r} requires an explicit 'seed' (the seed "
                "is part of the release identity the ledger audits; an "
                "implicit default would silently collide across releases)"
            )
        value = str(raw.get("value", "") or "")
        bound = int(raw.get("bound", 0) or 0)
        entity = str(raw.get("entity", "") or "")
        domain = raw.get("domain")
        if kind in ("sum", "avg"):
            if not value:
                raise DPBudgetError(f"release {name!r} ({kind}) requires 'value'")
            if bound <= 0:
                raise DPBudgetError(
                    f"release {name!r} ({kind}) requires a positive 'bound' "
                    "(the per-row contribution clamp; without it no finite "
                    "noise is DP)"
                )
        if kind == "user_count":
            if not entity:
                raise DPBudgetError(
                    f"release {name!r} (user_count) requires 'entity'"
                )
            if len(gb) != 1:
                raise DPBudgetError(
                    f"release {name!r} (user_count) takes exactly one "
                    "group_by column"
                )
        if domain is not None:
            if kind != "count":
                raise DPBudgetError(
                    f"release {name!r}: 'domain' (known public key list) "
                    "is only supported for kind: count"
                )
            if len(gb) != 1:
                raise DPBudgetError(
                    f"release {name!r}: 'domain' takes exactly one "
                    "group_by column"
                )
            if not isinstance(domain, (list, tuple)) or not domain:
                raise DPBudgetError(
                    f"release {name!r}: 'domain' must be a non-empty list"
                )
        bin_width = int(raw.get("bin_width", 0) or 0)
        if bin_width:
            if kind != "count":
                raise DPBudgetError(
                    f"release {name!r}: 'bin_width' (histogram binning) "
                    "is only supported for kind: count"
                )
            if len(gb) != 1:
                raise DPBudgetError(
                    f"release {name!r}: 'bin_width' takes exactly one "
                    "group_by column (the numeric column to bin)"
                )
            if bin_width < 0:
                raise DPBudgetError(
                    f"release {name!r}: bin_width must be positive"
                )
        return cls(
            name=name,
            table=table,
            kind=kind,
            group_by=tuple(str(c) for c in gb),
            epsilon=epsilon,
            seed=seed,
            value=value,
            bound=bound,
            entity=entity,
            domain=tuple(domain) if domain is not None else None,
            bin_width=bin_width,
        )

    @property
    def relation_key(self) -> tuple:
        """Identity of the RELEASED STATISTIC: same key = the noise
        protects the same numbers, so repeats compose sequentially."""
        return (
            self.table,
            self.kind,
            self.group_by,
            self.value,
            self.bound,
            self.entity,
            self.bin_width,
        )

    @property
    def adjacency(self) -> str:
        return "user" if self.kind == "user_count" else "row"

    @property
    def spend(self) -> float:
        """Epsilon cost of one fresh release of this spec: avg composes
        a sum release and a count release (privacy.py:dp_noisy_avg)."""
        return 2.0 * self.epsilon if self.kind == "avg" else self.epsilon


class DPLedger:
    """Accumulates releases, enforcing the composition rules the
    primitives document:

    - identical re-release (same relation, seed, epsilon): byte-identical
      output, spends NOTHING — recorded at zero with a warning so the
      config duplication is visible.
    - same relation + same seed + DIFFERENT epsilon: REFUSED. Both
      releases derive noise from the same uniform draw through different
      breakpoint tables; publishing both lets a reader difference them
      and recover the true value far beyond either epsilon. There is no
      legitimate use — change the seed (and pay composition) or drop one.
    - same relation + fresh seed: legal sequential composition — the
      epsilon ADDS (this is also exactly the averaging attack when done
      by accident); warned with the running total.
    - same (seed, group_by) on a DIFFERENT relation: warned. The noise
      key is (group value, seed), so overlapping group values across the
      two releases draw IDENTICAL noise (e.g. a count and a sum grouped
      the same way, same seed — their unit noises are equal and cancel
      in ratios). Fresh seed per release is the safe default.
    """

    def __init__(self) -> None:
        self.entries: list[dict] = []

    def preload(self, manifest: dict) -> int:
        """Seed the ledger from a PRIOR run's manifest, so accounting is
        cumulative across CLI invocations — the actually-dangerous leak
        is not one config re-listing a relation but an operator
        re-running `release` weekly with a fresh seed, silently
        composing epsilon forever. Prior entries are appended as-is
        (they already happened; no warnings fire between them), and the
        CURRENT run's records then validate against the full history.
        Returns the number of entries loaded."""
        n = 0
        for r in manifest.get("releases", []):
            spec = ReleaseSpec(
                name=str(r.get("name", "")),
                table=str(r.get("table", "")),
                kind=str(r.get("kind", "")),
                group_by=tuple(r.get("group_by", [])),
                epsilon=float(r.get("epsilon", 0.0)),
                seed=str(r.get("seed", "")),
                value=str(r.get("value", "") or ""),
                bound=int(r.get("bound", 0) or 0),
                entity=str(r.get("entity", "") or ""),
                bin_width=int(r.get("bin_width", 0) or 0),
            )
            self.entries.append(
                {"spec": spec, "charged": float(r.get("epsilon_charged", 0.0))}
            )
            n += 1
        return n

    def record(self, spec: ReleaseSpec) -> float:
        """Validate ``spec`` against the ledger and append it.
        Returns the epsilon actually charged."""
        charged = spec.spend
        for e in self.entries:
            prior: ReleaseSpec = e["spec"]
            if prior.relation_key == spec.relation_key:
                if prior.seed == spec.seed:
                    if prior.epsilon == spec.epsilon:
                        warnings.warn(
                            f"release {spec.name!r} is an identical "
                            f"re-release of {prior.name!r} (same relation, "
                            "seed, epsilon): output is byte-identical and "
                            "spends no additional budget — drop the "
                            "duplicate from the config",
                            DPReleaseWarning,
                            stacklevel=2,
                        )
                        charged = 0.0
                        break
                    raise DPBudgetError(
                        f"release {spec.name!r} re-releases the relation of "
                        f"{prior.name!r} with the SAME seed {spec.seed!r} "
                        f"but a different epsilon ({spec.epsilon} vs "
                        f"{prior.epsilon}): both noise draws come from one "
                        "uniform sample, so publishing both lets a reader "
                        "difference the releases and strip the noise. Use "
                        "a fresh seed (epsilon then composes) or remove one"
                    )
                total = self.relation_epsilon(spec.relation_key) + charged
                warnings.warn(
                    f"release {spec.name!r} re-releases the relation of "
                    f"{prior.name!r} with a fresh seed: fresh noise over "
                    "the same statistic is sequential composition — the "
                    "averaging attack surface when unintended. Epsilon "
                    f"accumulates: this relation now totals {total:g}",
                    DPReleaseWarning,
                    stacklevel=2,
                )
                break
        else:
            for e in self.entries:
                prior = e["spec"]
                if (
                    prior.seed == spec.seed
                    and prior.group_by == spec.group_by
                ):
                    warnings.warn(
                        f"release {spec.name!r} reuses seed {spec.seed!r} "
                        f"and group_by of {prior.name!r} on a different "
                        "relation: overlapping group values draw IDENTICAL "
                        "noise in both releases (correlated noise cancels "
                        "in differences/ratios). Use a fresh seed per "
                        "release",
                        DPReleaseWarning,
                        stacklevel=2,
                    )
                    break
        self.entries.append({"spec": spec, "charged": charged})
        return charged

    def relation_epsilon(self, relation_key: tuple) -> float:
        return sum(
            e["charged"]
            for e in self.entries
            if e["spec"].relation_key == relation_key
        )

    @property
    def total_epsilon(self) -> float:
        return sum(e["charged"] for e in self.entries)

    def manifest(self) -> dict:
        """JSON-ready release manifest: per-release rows + per-relation
        epsilon totals. Contains release METADATA only (the seed is
        included deliberately: the manifest is the operator-side audit
        record and must never be published with the released data —
        the guarantee holds against readers who do not know the seed)."""
        relations: dict[str, dict] = {}
        releases = []
        for e in self.entries:
            s: ReleaseSpec = e["spec"]
            gb = ",".join(s.group_by)
            if s.bin_width:
                gb = f"{gb}:bin{s.bin_width}"
            rk = "/".join(str(p) for p in (s.table, s.kind, gb) if p)
            releases.append(
                {
                    "name": s.name,
                    "table": s.table,
                    "kind": s.kind,
                    "group_by": list(s.group_by),
                    **({"value": s.value, "bound": s.bound} if s.value else {}),
                    **({"entity": s.entity} if s.entity else {}),
                    **({"bin_width": s.bin_width} if s.bin_width else {}),
                    **({"domain_size": len(s.domain)} if s.domain else {}),
                    "epsilon": s.epsilon,
                    "epsilon_charged": e["charged"],
                    "seed": s.seed,
                    "adjacency": s.adjacency,
                    "relation": rk,
                }
            )
            rel = relations.setdefault(
                rk, {"epsilon_spent": 0.0, "adjacency": s.adjacency}
            )
            rel["epsilon_spent"] += e["charged"]
        from .. import __version__

        return {
            "engine_version": __version__,
            "releases": releases,
            "relations": relations,
            "total_epsilon": self.total_epsilon,
        }


@dataclass(frozen=True)
class AuditSpec:
    """One configured privacy audit (config ``privacy.audit[]`` entry):
    a re-identification check over a quasi-identifier combination —
    the linkage-attack surface per-column masking cannot see
    (operators/privacy.py module docstring)."""

    table: str
    quasi: tuple[str, ...]
    k: int = 0  # k-anonymity: min equivalence-class size >= k
    l: int = 0  # l-diversity: min distinct sensitive per class >= l
    t: float = 0.0  # t-closeness: max TV distance <= t
    sensitive: str = ""

    @classmethod
    def parse(cls, raw: dict[str, Any], index: int = 0) -> "AuditSpec":
        if not isinstance(raw, dict):
            raise DPBudgetError(
                f"privacy.audit[{index}] must be a mapping"
            )
        table = str(raw.get("table", "") or "")
        if not table:
            raise DPBudgetError(f"privacy.audit[{index}] requires 'table'")
        quasi = raw.get("quasi") or []
        if isinstance(quasi, str):
            quasi = [quasi]
        if not quasi:
            raise DPBudgetError(
                f"privacy.audit[{index}] ({table}) requires 'quasi' "
                "(the quasi-identifier columns)"
            )
        k = int(raw.get("k", 0) or 0)
        l = int(raw.get("l", 0) or 0)  # noqa: E741 - the standard name
        t = float(raw.get("t", 0.0) or 0.0)
        sensitive = str(raw.get("sensitive", "") or "")
        if not (k or l or t):
            raise DPBudgetError(
                f"privacy.audit[{index}] ({table}) requires at least one "
                "of k (k-anonymity), l (l-diversity), t (t-closeness)"
            )
        if (l or t) and not sensitive:
            raise DPBudgetError(
                f"privacy.audit[{index}] ({table}): l/t checks require "
                "'sensitive' (the sensitive column)"
            )
        return cls(
            table=table,
            quasi=tuple(str(c) for c in quasi),
            k=k,
            l=l,
            t=t,
            sensitive=sensitive,
        )


def parse_audits(privacy_raw: dict[str, Any]) -> list[AuditSpec]:
    raw_list = privacy_raw.get("audit") or []
    if not isinstance(raw_list, list):
        raise DPBudgetError("privacy.audit must be a list")
    return [AuditSpec.parse(r, i) for i, r in enumerate(raw_list)]


def run_privacy_audit(spark_df, spec: AuditSpec) -> list[tuple]:
    """(table, constraint, passed, observed) rows for ``spec`` — the
    same shape as the relational audit, so the CLI merges them into one
    PASS/FAIL report. Each check is ONE aggregate over the operator's
    relation (class-count-sized), collected as a single worst-case row."""
    from pyspark.sql import functions as F

    from . import privacy as P

    quasi = list(spec.quasi)
    qname = ",".join(quasi)
    out = []
    if spec.k:
        worst = (
            P.k_anonymity_stats(spark_df, quasi)
            .agg(F.min("class_size"))
            .first()[0]
        )
        out.append(
            (
                spec.table,
                f"k_anonymity(quasi={qname}, k={spec.k})",
                worst is not None and worst >= spec.k,
                float(worst) if worst is not None else None,
            )
        )
    if spec.l:
        worst = (
            P.l_diversity_stats(spark_df, quasi, spec.sensitive)
            .agg(F.min("l_distinct"))
            .first()[0]
        )
        out.append(
            (
                spec.table,
                f"l_diversity(quasi={qname}, sensitive={spec.sensitive}, "
                f"l={spec.l})",
                worst is not None and worst >= spec.l,
                float(worst) if worst is not None else None,
            )
        )
    if spec.t:
        worst = (
            P.t_closeness_stats(spark_df, quasi, spec.sensitive)
            .agg(F.max("tv_distance"))
            .first()[0]
        )
        out.append(
            (
                spec.table,
                f"t_closeness(quasi={qname}, sensitive={spec.sensitive}, "
                f"t={spec.t})",
                worst is not None and worst <= spec.t,
                float(worst) if worst is not None else None,
            )
        )
    return out


def parse_releases(privacy_raw: dict[str, Any]) -> list[ReleaseSpec]:
    """Validate a config ``privacy`` block at LOAD time (fail before any
    Spark work, like every other config error)."""
    if not isinstance(privacy_raw, dict):
        raise DPBudgetError("privacy must be a mapping")
    raw_list = privacy_raw.get("releases")
    if not isinstance(raw_list, list) or not raw_list:
        raise DPBudgetError(
            "privacy requires a non-empty 'releases' list"
        )
    return [ReleaseSpec.parse(r, i) for i, r in enumerate(raw_list)]


def validate_privacy_block(privacy_raw: dict[str, Any]) -> None:
    """Load-time validation of the whole ``privacy`` block: releases
    and/or audit, each entry fully validated."""
    if not isinstance(privacy_raw, dict):
        raise DPBudgetError("privacy must be a mapping")
    has_releases = bool(privacy_raw.get("releases"))
    has_audit = bool(privacy_raw.get("audit"))
    if not has_releases and not has_audit:
        raise DPBudgetError(
            "privacy requires a 'releases' list and/or an 'audit' list"
        )
    if has_releases:
        parse_releases(privacy_raw)
    parse_audits(privacy_raw)


def run_release(spark_df, spec: ReleaseSpec):
    """Build the release DataFrame for ``spec`` over its source table."""
    from pyspark.sql import functions as F

    from . import privacy as P

    if spec.kind == "count":
        col = spec.group_by[0]
        if spec.bin_width:
            # histogram: bin the numeric column to a public integer grid
            # BEFORE grouping (the bin identity, not the raw value, is
            # the released key)
            binned = f"{col}_bin"
            spark_df = spark_df.select(
                (
                    F.floor(F.col(col) / F.lit(float(spec.bin_width))).cast(
                        "long"
                    )
                    * F.lit(int(spec.bin_width))
                ).alias(binned)
            )
            col = binned
        if spec.domain is not None:
            return P.dp_noisy_count_known_domain(
                spark_df,
                col,
                list(spec.domain),
                epsilon=spec.epsilon,
                seed=spec.seed,
            )
        return P.dp_noisy_count(
            spark_df,
            [col] if spec.bin_width else list(spec.group_by),
            epsilon=spec.epsilon,
            seed=spec.seed,
        )
    if spec.kind == "sum":
        return P.dp_noisy_sum(
            spark_df,
            list(spec.group_by),
            spec.value,
            spec.bound,
            epsilon=spec.epsilon,
            seed=spec.seed,
        )
    if spec.kind == "avg":
        return P.dp_noisy_avg(
            spark_df,
            list(spec.group_by),
            spec.value,
            spec.bound,
            epsilon=spec.epsilon,
            seed=spec.seed,
        )
    if spec.kind == "user_count":
        return P.dp_noisy_count_entities(
            spark_df,
            spec.group_by[0],
            spec.entity,
            epsilon=spec.epsilon,
            seed=spec.seed,
        )
    raise DPBudgetError(f"unknown release kind {spec.kind!r}")
