"""Privacy guarantees beyond per-column masking: k-anonymity,
generalisation, suppression, l-diversity.

The reference masks columns independently (anonymiser.go:34-101) — it
cannot say anything about re-identification via quasi-identifier
COMBINATIONS (the classic linkage attack: zip+age+gender singles people
out even with names masked). These operators close that gap, all as
plain DataFrame aggregations/projections:

- ``generalize_*``: lower the resolution of a quasi-identifier (numeric
  binning, timestamp truncation, string prefixing) — the standard
  generalisation hierarchies,
- ``k_anonymity_stats`` / ``k_anonymity_violations``: equivalence-class
  sizes over the quasi-identifier set; a table is k-anonymous iff every
  class has >= k rows,
- ``suppress_below_k``: drop rows in classes smaller than k (suppression,
  the complement of generalisation),
- ``l_diversity_stats``: distinct sensitive values per class (protects
  against homogeneity within a k-anonymous class).

Scale: everything is one groupBy over the quasi-identifiers (map-side
partial aggregation; the class-size join back is a broadcast when the
class count is modest, AQE otherwise). No row-level Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def generalize_numeric(col: str, bin_width: float) -> Column:
    """value -> left edge of its bin (e.g. acctbal 1234.56, width 1000 ->
    1000.0)."""
    return (
        (F.floor(F.col(f"`{col}`") / F.lit(bin_width)) * F.lit(bin_width))
        .cast("double")
    )


def generalize_prefix(col: str, length: int) -> Column:
    """string -> its first ``length`` chars (zip/phone prefix hierarchy)."""
    return F.substring(F.col(f"`{col}`").cast("string"), 1, length)


def generalize_time(col: str, unit: str = "month") -> Column:
    """timestamp -> truncated to unit ('year'|'month'|'week'|'day'|'hour')."""
    return F.date_trunc(unit, F.col(f"`{col}`"))


def shift_dates(col: str, key_col: str, max_days: int = 30) -> Column:
    """Deterministic per-key date shifting: every timestamp of a key moves
    by the SAME hash-derived offset in [1, max_days], so intervals and
    ordering within a key are preserved while absolute dates are
    decoupled — the standard longitudinal-data anonymisation. Pure JVM
    expression (cross-engine: md5-digit derived, mirrored by
    duck_shift_dates_sql)."""
    days = (
        f"CAST(substr(translate(md5(CAST(`{key_col}` AS STRING)), "
        f"'abcdef', '012345'), 1, 6) AS BIGINT) % {max_days} + 1"
    )
    return F.expr(f"timestampadd(DAY, CAST({days} AS INT), `{col}`)")


def duck_shift_dates_sql(col: str, key_col: str, max_days: int = 30) -> str:
    days = (
        f"CAST(substr(translate(md5(CAST({key_col} AS VARCHAR)), "
        f"'abcdef', '012345'), 1, 6) AS BIGINT) % {max_days} + 1"
    )
    return f"{col} + CAST({days} AS INTEGER) * INTERVAL 1 DAY"


def perturb_numeric(col: str, key_col: str, step: float, buckets: int = 21) -> Column:
    """Deterministic numeric perturbation: value + (hash(key) mod buckets
    - buckets//2) * step — zero-mean hash noise that breaks exact-value
    linkage while bounding the error to +-(buckets//2)*step. Reversible
    only with the key universe; cross-engine deterministic."""
    offset = (
        f"(CAST(substr(translate(md5(CAST(`{key_col}` AS STRING)), "
        f"'abcdef', '012345'), 7, 6) AS BIGINT) % {buckets} - {buckets // 2})"
    )
    return F.expr(f"`{col}` + {offset} * CAST({step} AS DOUBLE)")


def duck_perturb_numeric_sql(col: str, key_col: str, step: float, buckets: int = 21) -> str:
    offset = (
        f"(CAST(substr(translate(md5(CAST({key_col} AS VARCHAR)), "
        f"'abcdef', '012345'), 7, 6) AS BIGINT) % {buckets} - {buckets // 2})"
    )
    return f"{col} + {offset} * CAST({step} AS DOUBLE)"


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Equivalence-class size per quasi-identifier combination."""
    return df.groupBy(*[F.col(f"`{c}`") for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Classes with fewer than k rows — the re-identifiable combinations.
    Empty result == table is k-anonymous for these quasi-identifiers."""
    return k_anonymity_stats(df, quasi_cols).filter(F.col("class_size") < k)


def suppress_below_k(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Drop every row whose equivalence class is smaller than k.

    Implemented as an inner join against the >=k classes (broadcast when
    small, AQE-chosen otherwise) — never a window over the whole table.

    The join is NULL-safe (<=>): groupBy treats NULL as its own
    equivalence class, so a NULL-valued class with >= k members must be
    retained — a plain equality join would silently suppress it."""
    ok = (
        k_anonymity_stats(df, quasi_cols)
        .filter(F.col("class_size") >= k)
        .select(*[F.col(c).alias(f"__ok_{c}") for c in quasi_cols])
    )
    cond = None
    for c in quasi_cols:
        clause = df[f"`{c}`"].eqNullSafe(F.col(f"__ok_{c}"))
        cond = clause if cond is None else (cond & clause)
    return df.join(ok, cond, "inner").select(*[df[f"`{c}`"] for c in df.columns])


def l_diversity_stats(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Distinct sensitive values per equivalence class; l-diverse iff every
    class has >= l distinct values."""
    return df.groupBy(*[F.col(f"`{c}`") for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.count_distinct(F.col(f"`{sensitive_col}`")).cast("long").alias("l_distinct"),
    )


def pseudonymize_column(
    col: str, key: str, mode: str = "GCM", deterministic: bool = False
) -> Column:
    """REVERSIBLE pseudonymization of a column via the JVM-side
    ``aes_encrypt`` built-in (base64 text output) — the counterpart to
    the one-way faker maskers for deployments that must re-identify
    later under controlled key access (reference's maskers are
    irreversible by design, anonymiser.go: faker templates only).

    Mode choice is a real privacy/utility trade, stated rather than
    hidden:

    - default GCM: random-IV authenticated encryption — two rows with
      the SAME value get DIFFERENT ciphertexts, maximal confidentiality,
      but equality joins on the pseudonym are impossible and output is
      nondeterministic run-to-run.
    - ``deterministic=True`` (ECB): same value -> same token, so FK
      joins and consistency ("same original -> same pseudonym across
      all tables") survive — the property the faker maskers guarantee —
      at the documented cost that equality of plaintexts leaks. For
      pseudonymization that IS the feature; do not use it for
      high-entropy secrets where equality patterns are themselves
      sensitive.

    Stays in whole-stage codegen (built-in expression, no UDF). The key
    is passed as a bound literal through ``F.aes_encrypt`` — never
    string-spliced into SQL text, so keys containing quotes/backslashes
    are safe. CAVEAT the caller must know: a literal key is still
    VISIBLE in plan renderings (``explain()``, the Spark UI SQL tab,
    event logs) like any literal — source the key from a secret store,
    never a config file, and restrict UI/event-log access in
    deployments where the plans are sensitive."""
    m = F.lit("ECB" if deterministic else mode)
    return F.base64(
        F.aes_encrypt(F.col(col).cast("string"), F.lit(key), m)
    )


def depseudonymize_column(col: str, key: str, mode: str = "GCM", deterministic: bool = False) -> Column:
    """Inverse of pseudonymize_column: base64 -> aes_decrypt -> string.
    Same bound-literal key handling (and plan-visibility caveat) as the
    encrypt side."""
    m = F.lit("ECB" if deterministic else mode)
    return F.aes_decrypt(F.unbase64(F.col(col)), F.lit(key), m).cast(
        "string"
    )


# ---------------------------------------------------------------------------
# Differentially private counts: the two-sided geometric mechanism
# ---------------------------------------------------------------------------


def geometric_inverse_cdf(
    epsilon: float, scale_bits: int = 52
) -> tuple[list[int], int]:
    """Driver-side inverse-CDF breakpoint table for the two-sided
    geometric mechanism (Ghosh/Roughgarden/Sundararajan SICOMP'12 — the
    utility-optimal noise for integer count queries): noise Z has
    P(Z = k) = (1-a)/(1+a) * a^|k| with a = e^(-epsilon).

    Returns ``(breaks, K)`` where ``breaks[i] = floor(CDF(-K + i) * 2^b)``
    for k in [-K, K) and K is the smallest tail bound with
    P(|Z| > K) < 2^-b — so a uniform integer u in [0, 2^b) maps to
    noise = |{break <= u}| - K, entirely in INT64 comparisons against
    literal constants. Both engines evaluate the same table against the
    same md5-derived u, so the released noisy counts are bit-identical
    cross-engine (the exactness discipline every sampling op here uses;
    float inverse-CDF noise would differ in low bits per libm)."""
    import math

    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    a = math.exp(-epsilon)
    m = 1 << scale_bits
    k_tail = 1
    while 2 * a ** (k_tail + 1) / (1 + a) > 2.0**-scale_bits:
        k_tail += 1
    coef = (1 - a) / (1 + a)
    breaks: list[int] = []
    cdf = 0.0
    for k in range(-k_tail, k_tail):
        cdf += coef * a ** abs(k)
        breaks.append(int(cdf * m))
    return breaks, k_tail


def _uniform52_duck(key_sql: str) -> str:
    """52-bit exactly-uniform integer from md5 (13 hex chars = 52 bits;
    no modulo bias because the draw IS the full bit width). The Spark
    side is the same draw via conv(substr(md5, 1, 13), 16, 10)."""
    return (
        f"list_reduce(list_transform(generate_series(1, 13), "
        f"i -> strpos('0123456789abcdef', substr(md5({key_sql}), i, 1)) - 1), "
        f"(acc, d) -> acc * 16 + d)"
    )


def dp_noise_column(
    key: Column, epsilon: float = 1.0, seed: str = "dbmask-dp"
) -> Column:
    """Integer geometric noise as a Column: deterministic function of
    (key, seed) — the seeded-PRG form every production DP release uses
    (noise must be FIXED per release: re-querying must return the same
    answer, otherwise averaging repeated queries strips the noise). The
    epsilon-DP guarantee holds against anyone who does not know the
    seed; treat the seed like a key and use a fresh one per release
    (each re-release with a new seed spends another epsilon of budget)."""
    breaks, k_tail = geometric_inverse_cdf(epsilon)
    arr = ", ".join(str(b) for b in breaks)
    key_str = F.concat(key.cast("string"), F.lit(":" + seed))
    u = F.conv(F.md5(key_str).substr(1, 13), 16, 10).cast("bigint")
    return (
        F.size(
            F.filter(
                F.expr(f"array({arr})"),
                lambda b: b <= u,
            )
        )
        - F.lit(k_tail)
    ).cast("long")


def dp_noisy_count(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> DataFrame:
    """Per-group COUNT(*) released under epsilon-differential privacy
    via the two-sided geometric mechanism — the aggregate-release
    counterpart of the row-level masking family: row masking protects
    identities inside the data, DP noise protects them in PUBLISHED
    STATISTICS (a count of 1 pinpoints a person; count+noise provably
    bounds what any query reveals about one row's presence).

    Count sensitivity is 1, so geometric noise with a = e^(-epsilon)
    gives exact epsilon-DP per released count. ADJACENCY IS ROW-LEVEL:
    the guarantee protects the presence of one ROW; an entity
    contributing k rows (one user, many events) is only protected at
    k*epsilon. For user-level guarantees, bound contribution first —
    aggregate to one row per (user, group) before this release — the
    same pre-step dp_noisy_sum's value clamp performs for magnitudes.

    PRECONDITION — THE GROUP DOMAIN MUST BE PUBLIC: rows are emitted
    only for group keys PRESENT in the data, so the released KEY SET is
    the exact true key set, unprotected by any noise — a group
    contributed by a single row reveals that row's group value with
    certainty (infinite privacy loss on the key release). The stated
    epsilon therefore only covers the COUNTS, and the release as a
    whole is epsilon-DP only when the key set is public knowledge or
    fixed independently of the data (status codes, country lists,
    calendar buckets). For data-derived keys (free-text values, user
    ids) use :func:`dp_noisy_count_known_domain`, which densifies
    against a caller-supplied public key list and releases a noisy
    count for EVERY domain key — presence in the output then carries
    zero information. The same precondition applies verbatim to
    :func:`dp_noisy_sum` and :func:`dp_noisy_avg`.
    Noise is a deterministic function of (group key, seed): see
    :func:`dp_noise_column` for the seeded-release semantics. Negative
    noisy counts are clamped at 0 (postprocessing — does not affect the
    guarantee).

    Scale shape: ONE map-side-combined groupBy shuffle (identical to the
    plain count); the noise is a per-GROUP literal-table lookup on the
    already-aggregated relation — zero extra shuffles, zero Python."""
    key = F.concat_ws(
        "|",
        *[
            # NULL-sentinel coalesce: concat_ws silently DROPS null
            # columns (separator included), so (NULL, x) and (x, NULL)
            # would otherwise share one noise draw and the DuckDB twin
            # (null-propagating ||) would diverge — probed, it did
            F.coalesce(F.col(c).cast("string"), F.lit("\u2400"))
            for c in group_cols
        ],
    )
    noisy = F.greatest(
        F.lit(0).cast("long"),
        F.count(F.lit(1)).cast("long")
        + dp_noise_column(key, epsilon, seed),
    )
    return df.groupBy(*group_cols).agg(noisy.alias(alias))


def duck_dp_noisy_count_sql(
    table: str,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> str:
    """DuckDB twin of :func:`dp_noisy_count` — same breakpoint table,
    same md5-derived uniform, byte-identical released counts."""
    breaks, k_tail = geometric_inverse_cdf(epsilon)
    arr = ", ".join(str(b) for b in breaks)
    cols = ", ".join(group_cols)
    key = (
        "concat(concat_ws('|', "
        + ", ".join(
            f"COALESCE(CAST({c} AS VARCHAR), '\u2400')" for c in group_cols
        )
        + f"), ':{seed}')"
    )
    u = _uniform52_duck(key)
    return f"""
    SELECT {cols},
      GREATEST(0, CAST(count(*) AS BIGINT)
        + len(list_filter([{arr}], b -> b <= {u})) - {k_tail}) AS {alias}
    FROM {table} GROUP BY {cols}
    """


def dp_noisy_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bound: int,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_sum",
) -> DataFrame:
    """Per-group SUM released under epsilon-DP with a BOUNDED-CONTRIBUTION
    clamp — the companion to :func:`dp_noisy_count` for magnitude
    queries. Three integer steps, each cross-engine exact:

    1. clamp every row's value into [0, bound] (the contribution bound:
       without it one row can move the sum arbitrarily and no finite
       noise is DP; the clamp is a stated bias/privacy trade),
    2. round the clamped sum to GRANULARITY ``bound`` (integer
       ``(S + bound/2) DIV bound``) — rounding is applied to the true
       sum of a neighbouring-dataset pair too, so the rounded statistic
       has sensitivity exactly 1 unit,
    3. add the SAME two-sided geometric noise table as the count path
       (sensitivity-1 integer mechanism) in units, clamp at 0, and
       release units * bound.

    The release is therefore a non-negative multiple of ``bound``; its
    error vs the clamped sum is at most bound/2 (rounding) plus
    bound * |Z| (noise). One map-side-combined groupBy shuffle, noise on
    the aggregated relation — same scale shape as the plain sum.

    Same PUBLIC-GROUP-DOMAIN precondition as :func:`dp_noisy_count`:
    the emitted key set is the true key set; only use with public/fixed
    group keys (or densify first)."""
    if bound <= 0:
        raise ValueError(f"bound must be a positive integer, got {bound}")
    key = F.concat_ws(
        "|",
        *[
            # NULL-sentinel coalesce: concat_ws silently DROPS null
            # columns (separator included), so (NULL, x) and (x, NULL)
            # would otherwise share one noise draw and the DuckDB twin
            # (null-propagating ||) would diverge — probed, it did
            F.coalesce(F.col(c).cast("string"), F.lit("\u2400"))
            for c in group_cols
        ],
    )
    clamped = F.least(
        F.greatest(F.col(value_col).cast("long"), F.lit(0).cast("long")),
        F.lit(int(bound)).cast("long"),
    )
    agg = df.groupBy(*group_cols).agg(F.sum(clamped).alias("_s"))
    units = F.expr(f"(_s + {bound // 2}) DIV {bound}")
    noisy_units = F.greatest(
        F.lit(0).cast("long"),
        units + dp_noise_column(key, epsilon, seed),
    )
    return agg.select(
        *group_cols, (noisy_units * F.lit(int(bound))).alias(alias)
    )


def dp_noisy_count_known_domain(
    df: DataFrame,
    group_col: str,
    domain: list,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> DataFrame:
    """:func:`dp_noisy_count` for DATA-DERIVED group keys: densify
    against a caller-supplied PUBLIC domain list and release a noisy
    count for EVERY domain key (absent keys get noise around 0), so the
    released key set carries zero information about the data — this is
    the known-domain variant the plain release's precondition calls
    for. Rows whose key falls OUTSIDE the domain are dropped before
    counting (standard domain clamping; keeping them would re-leak the
    true key set through the residual). Sensitivity is unchanged (one
    row still moves one count by 1), so the epsilon accounting is
    identical.

    Scale shape: the domain is a driver-side literal list (public, by
    definition small enough to publish) broadcast against the
    already-aggregated counts — one groupBy shuffle, zero extra
    exchanges, zero Python."""
    if not domain:
        raise ValueError("domain must be a non-empty public key list")
    dtype = df.schema[group_col].dataType
    # literal-array explode, NOT createDataFrame: the latter ships the
    # domain through a Python RDD (Scan ExistingRDD, UnknownPartitioning)
    # which drags a Python stage into an otherwise pure-JVM release plan;
    # exploding a literal array stays in whole-stage codegen (explode
    # keeps NULL elements, so a NULL domain key survives)
    dom = df.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(v).cast(dtype) for v in domain])
        ).alias(group_col)
    )
    counts = (
        # null-safe semi join: a NULL key listed in the (public) domain
        # must be counted, mirroring the twin's explicit NULL branch
        df.join(
            F.broadcast(dom),
            df[group_col].eqNullSafe(dom[group_col]),
            "left_semi",
        )
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    key = F.coalesce(
        dom[group_col].cast("string"), F.lit("␀")
    )
    noisy = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(F.col("_c"), F.lit(0).cast("long"))
        + dp_noise_column(key, epsilon, seed),
    )
    return (
        dom.join(
            counts, dom[group_col].eqNullSafe(counts[group_col]), "left"
        )
        .select(dom[group_col], noisy.alias(alias))
    )


def _sql_literal(v) -> str:
    """Render a Python value as an ANSI SQL literal (the domain lists
    are caller-supplied public constants, never data)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        # bind as BIGINT, not INTEGER: the Spark side casts domain
        # literals to the (long) group column's type, and the driver
        # hash-compares Arrow BYTES — an int32 domain column would
        # diverge physically even with identical values (the same
        # defect class as the r12 HUGEINT noisy_sum red row)
        return f"CAST({v!r} AS BIGINT)"
    if isinstance(v, float):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def duck_dp_noisy_count_known_domain_sql(
    table: str,
    group_col: str,
    domain: list,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> str:
    """DuckDB twin of :func:`dp_noisy_count_known_domain` — same domain
    densification, same noise table, byte-identical releases."""
    breaks, k_tail = geometric_inverse_cdf(epsilon)
    arr = ", ".join(str(b) for b in breaks)
    vals = ", ".join(f"({_sql_literal(v)})" for v in domain)
    key = (
        f"concat(COALESCE(CAST(dom.{group_col} AS VARCHAR), '␀'), "
        f"':{seed}')"
    )
    u = _uniform52_duck(key)
    return f"""
    WITH dom({group_col}) AS (VALUES {vals}),
    cnt AS (
      SELECT t.{group_col}, CAST(count(*) AS BIGINT) AS _c
      FROM {table} t
      WHERE t.{group_col} IN (SELECT {group_col} FROM dom)
         OR (t.{group_col} IS NULL
             AND EXISTS (SELECT 1 FROM dom WHERE {group_col} IS NULL))
      GROUP BY t.{group_col})
    SELECT dom.{group_col},
      GREATEST(0, COALESCE(cnt._c, 0)
        + len(list_filter([{arr}], b -> b <= {u})) - {k_tail}) AS {alias}
    FROM dom LEFT JOIN cnt
      ON dom.{group_col} IS NOT DISTINCT FROM cnt.{group_col}
    """


def duck_dp_noisy_sum_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    bound: int,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_sum",
) -> str:
    """DuckDB twin of :func:`dp_noisy_sum` — identical clamp, rounding,
    breakpoint table and md5 uniform; byte-identical releases."""
    breaks, k_tail = geometric_inverse_cdf(epsilon)
    arr = ", ".join(str(b) for b in breaks)
    cols = ", ".join(group_cols)
    key = (
        "concat(concat_ws('|', "
        + ", ".join(
            f"COALESCE(CAST({c} AS VARCHAR), '\u2400')" for c in group_cols
        )
        + f"), ':{seed}')"
    )
    u = _uniform52_duck(key)
    return f"""
    WITH agg AS (
      SELECT {cols},
        sum(LEAST(GREATEST(CAST({value_col} AS BIGINT), 0), {bound})) AS s
      FROM {table} GROUP BY {cols})
    SELECT {cols},
      CAST(GREATEST(0, (s + {bound // 2}) // {bound}
        + len(list_filter([{arr}], b -> b <= {u})) - {k_tail})
        * {bound} AS BIGINT) AS {alias}
    FROM agg
    """


def dp_noisy_avg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bound: int,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_avg",
) -> DataFrame:
    """Per-group MEAN released under differential privacy as the ratio
    of the two integer releases (:func:`dp_noisy_sum` over
    :func:`dp_noisy_count`) — the standard composed-mean mechanism.
    Privacy accounting is stated, not hidden: the sum and the count each
    spend ``epsilon``, so the released mean costs 2*epsilon under
    sequential composition (both draws use distinct seeds derived from
    ``seed``). The division is post-processing (free), computed
    bigint/bigint in IEEE double — one exactly-rounded operation, so
    cross-engine bit-identical like the integer releases themselves.
    Groups whose noisy count clamps to 0 release NULL (no denominator;
    also the honest signal that the group was too small to survive the
    noise). Same PUBLIC-GROUP-DOMAIN precondition as
    :func:`dp_noisy_count`: only use with public/fixed group keys."""
    s = dp_noisy_sum(
        df, group_cols, value_col, bound, epsilon, seed + ":sum", "_s"
    )
    c = dp_noisy_count(df, group_cols, epsilon, seed + ":count", "_c")
    # NULL-SAFE join (<=>): groupBy emits NULL group keys as their own
    # group, and a plain equi-join would silently drop them from the
    # release while the DuckDB twin (IS NOT DISTINCT FROM) keeps them —
    # probed, the engines diverged exactly there (the count path's
    # sentinel protects the noise KEY, not this join).
    on = None
    for g in group_cols:
        clause = s[g].eqNullSafe(c[g])
        on = clause if on is None else (on & clause)
    joined = s.join(c, on)
    return joined.select(
        *[s[g] for g in group_cols],
        F.when(
            F.col("_c") > 0,
            F.col("_s").cast("double") / F.col("_c").cast("double"),
        ).alias(alias),
    )


def duck_dp_noisy_avg_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    bound: int,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_avg",
) -> str:
    """DuckDB twin of :func:`dp_noisy_avg`."""
    cols = ", ".join(group_cols)
    s = duck_dp_noisy_sum_sql(
        table, group_cols, value_col, bound, epsilon, seed + ":sum", "_s"
    )
    c = duck_dp_noisy_count_sql(
        table, group_cols, epsilon, seed + ":count", "_c"
    )
    on = " AND ".join(
        f"s.{g} IS NOT DISTINCT FROM c.{g}" for g in group_cols
    )
    scols = ", ".join(f"s.{g}" for g in group_cols)
    return f"""
    SELECT {scols},
      CASE WHEN c._c > 0
           THEN CAST(s._s AS DOUBLE) / CAST(c._c AS DOUBLE) END AS {alias}
    FROM ({s}) s JOIN ({c}) c ON {on}
    """


def t_closeness_stats(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Per-equivalence-class TOTAL VARIATION distance between the
    class's sensitive-value distribution and the table-wide one — the
    t-closeness audit (Li/Li/Venkatasubramanian ICDE'07) that completes
    the k-anonymity / l-diversity family: l-diversity counts DISTINCT
    sensitive values, but a class can be l-diverse and still leak (90%
    one disease vs 10% globally — skewness attack); a table is
    t-close iff every class's distance <= t.

    Exactness discipline: TV = 0.5 * sum_i |n_i/N_class - m_i/N_total|
    is a float SUM (order-dependent); computed instead as
    0.5 * sum_i |n_i*N_total - m_i*N_class| / (N_class*N_total) — the
    numerators are exact BIGINTs summed exactly, ONE double division at
    the end, so both engines agree bitwise.

    Scale shape: one (class x sensitive) aggregate over one scan; the
    global sensitive histogram (sensitive-cardinality rows) and the
    1-row total broadcast back; the per-class reduce keys on the
    quasi-identifiers. Missing (class, value) cells contribute
    m_i*N_class via the global side — handled by a dense right join
    against the class x histogram grid."""
    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_i")
    )
    class_tot = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_class")
    )
    glob = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("m_i")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    # dense grid: every class x every sensitive value (absent cells
    # n_i = 0 still contribute |0 - m_i * N_class|)
    grid = class_tot.crossJoin(F.broadcast(glob)).crossJoin(
        F.broadcast(total)
    )
    on = [
        *[grid[c].eqNullSafe(cell[c]) for c in quasi_cols],
        grid[sensitive_col].eqNullSafe(cell[sensitive_col]),
    ]
    joined = grid.join(cell, on, "left").select(
        *[grid[c] for c in quasi_cols],
        grid[sensitive_col],
        F.coalesce(cell["n_i"], F.lit(0)).alias("n_i"),
        "n_class",
        "m_i",
        "n_total",
    )
    # cast the OPERANDS, not just the sum: a BIGINT product n_i*n_total
    # wraps silently (non-ANSI Spark) above ~3e9 total rows — exactly
    # the corpus size this audit targets — while the DuckDB twin errors,
    # so the engines would diverge where the overflow comment claimed
    # safety. DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0) is exact in
    # BOTH engines (DuckDB rejects wider operand pairs at bind time).
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    num = F.abs(d19("n_i") * d19("n_total") - d19("m_i") * d19("n_class"))
    return (
        joined.groupBy(*quasi_cols)
        .agg(
            F.max("n_class").alias("class_size"),
            # decimal -> string -> double keeps the one conversion
            # bit-identical cross-engine (native decimal->double casts
            # differ by 1 ulp between engines)
            F.sum(num.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .cast("double")
            .alias("_num"),
            F.max(d19("n_class") * d19("n_total"))
            .cast("decimal(38,0)")
            .cast("string")
            .cast("double")
            .alias("_den"),
        )
        .select(
            *quasi_cols,
            F.col("class_size"),
            (F.lit(0.5) * F.col("_num") / F.col("_den")).alias(
                "tv_distance"
            ),
        )
    )


def dp_noisy_count_entities(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_entities",
) -> DataFrame:
    """USER-LEVEL DP counts: distinct entities per group, with adjacency
    = add/remove one ENTITY and all its rows — the guarantee
    :func:`dp_noisy_count` explicitly does not give. Two steps:

    1. contribution bounding: each entity is assigned to exactly ONE
       group — the minimum ``group_col`` value it appears under (a
       deterministic, data-independent-per-entity rule). Removing an
       entity then changes exactly one group count by exactly 1, so the
       bounded statistic has user-level sensitivity 1. The stated
       distortion: the released number is "entities whose first group is
       G", not "entities ever seen in G" — the price every bounded-
       contribution mechanism pays, made explicit instead of hidden.
    2. the same geometric noise table as the row-level release, clamped
       at 0.

    A useful corollary (property-tested): duplicating an entity's rows
    — or adding any number of NEW rows for an already-present entity in
    already-seen groups >= its minimum — cannot change the release at
    all. Scale shape: one entity-keyed aggregate, one group-keyed
    aggregate, noise on the final relation; both map-side combined."""
    first = df.groupBy(entity_col).agg(
        F.min(F.col(group_col)).alias(group_col)
    )
    return dp_noisy_count(first, [group_col], epsilon, seed, alias)


def duck_dp_noisy_count_entities_sql(
    table: str,
    group_col: str,
    entity_col: str,
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
    alias: str = "noisy_entities",
) -> str:
    """DuckDB twin of :func:`dp_noisy_count_entities`."""
    inner = (
        f"(SELECT {entity_col}, min({group_col}) AS {group_col} "
        f"FROM {table} GROUP BY {entity_col})"
    )
    return duck_dp_noisy_count_sql(inner, [group_col], epsilon, seed, alias)


def dp_quantiles_from_histogram(
    df: DataFrame,
    group_col: str,
    domain: list,
    percentiles: "list[int]",
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
) -> DataFrame:
    """DP quantiles by POST-PROCESSING the densified histogram release
    (:func:`dp_noisy_count_known_domain`): the released quantile for
    percentile p is the first public bin whose cumulative noisy count
    reaches p% of the noisy total. Post-processing of a DP release is
    free (no additional epsilon beyond the histogram's), the published
    values are drawn from the PUBLIC bin grid, and the arithmetic is
    all integer (cum * 100 >= p * total) — so the release is exact
    cross-engine and the privacy accounting is exactly the histogram's.
    Returns (pct, quantile_bin), one row per requested percentile.

    Scale shape: the histogram is one groupBy shuffle; the cumulative
    sum is a window over the PUBLIC bin grid — a bounded, published
    domain (tens to thousands of rows), so the single-partition window
    is a driver-sized footnote, not a data-sized sort. Degenerate case:
    a noisy total of 0 (every count clamped) releases the FIRST bin for
    every percentile — deterministic and honest (the data was too small
    to survive the noise)."""
    if not percentiles or any(
        not isinstance(p, int) or not (0 < p <= 100) for p in percentiles
    ):
        raise ValueError("percentiles must be integers in (0, 100]")
    hist = dp_noisy_count_known_domain(
        df, group_col, domain, epsilon=epsilon, seed=seed
    )
    # the histogram feeds BOTH the cumulative window and the total, and
    # Catalyst reuses neither scan nor exchange across two consumers
    # (the q15 plan-audit class). A persist() would also stop the
    # double aggregation, but the result is consumed lazily so there is
    # no sound unpersist point — a long-lived serving session would
    # leak one cached relation per call. Instead the release is
    # collected EAGERLY: it is grid-sized (|domain| rows, a published
    # constant) and it IS the DP release, so driver residency is by
    # definition public; the corpus aggregates exactly once, here, and
    # both consumers read the local relation.
    hist_schema = hist.schema
    hist_rows = hist.collect()
    # rebuilt as CATALYST LITERALS (not createDataFrame, which plans a
    # Python-RDD conversion): the released grid becomes a JVM-side
    # literal relation, keeping the post-processing plan Python-free
    hist = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            *[
                                F.lit(r[f.name])
                                .cast(f.dataType)
                                .alias(f.name)
                                for f in hist_schema.fields
                            ]
                        )
                        for r in hist_rows
                    ]
                )
            ).alias("_h")
        )
        .select("_h.*")
    )
    w_cum = (
        Window.orderBy(group_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        F.col(group_col),
        F.sum("noisy_count").over(w_cum).alias("_cum"),
    )
    tot = hist.agg(F.sum("noisy_count").alias("_tot"))
    pcts = hist.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in sorted(percentiles)])
        ).alias("pct")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .filter(F.col("_cum") * F.lit(100) >= F.col("pct") * F.col("_tot"))
        .groupBy("pct")
        .agg(F.min(group_col).alias("quantile_bin"))
    )


def duck_dp_quantiles_sql(
    table: str,
    group_col: str,
    domain: list,
    percentiles: "list[int]",
    epsilon: float = 1.0,
    seed: str = "dbmask-dp",
) -> str:
    """DuckDB twin of :func:`dp_quantiles_from_histogram` — the inner
    histogram is the settled known-domain twin, the post-processing the
    same integer comparisons."""
    inner = duck_dp_noisy_count_known_domain_sql(
        table, group_col, domain, epsilon=epsilon, seed=seed
    )
    pcts = ", ".join(f"({int(p)})" for p in sorted(percentiles))
    return f"""
    WITH hist AS ({inner}),
    cum AS (SELECT {group_col},
              sum(noisy_count) OVER (ORDER BY {group_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
            FROM hist),
    tot AS (SELECT sum(noisy_count) AS _tot FROM hist),
    pcts(pct) AS (VALUES {pcts})
    SELECT CAST(pcts.pct AS BIGINT) AS pct,
           CAST(min({group_col}) AS BIGINT) AS quantile_bin
    FROM cum, tot, pcts
    WHERE _cum * 100 >= pcts.pct * _tot
    GROUP BY 1
    """


def dp_stable_topk(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    threshold: int = 10,
    k: int = 10,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> DataFrame:
    """Stability-based DP heavy hitters over a DATA-DERIVED key domain —
    the release :func:`dp_noisy_count`'s precondition forbids (its key
    set must be public) and :func:`dp_noisy_count_known_domain` cannot
    reach (no caller can enumerate free-text values / user ids): add
    geometric noise to every group's count, release only groups whose
    noisy count clears ``threshold``, then keep the top ``k``. The
    thresholding is what protects the KEY release: a value contributed
    by one row survives only if its noise alone reaches ``threshold``,
    which for the two-sided geometric mechanism has probability
    ~ a^(threshold-1)/(1+a), a = e^(-epsilon) — pick
    ``threshold >= 1 + ceil(ln(1/(2*delta))/epsilon)`` for an
    (epsilon, delta)-DP release (Korolova et al., WWW'09 "Releasing
    search queries and clicks privately"; the widely-deployed
    unknown-domain mechanism). Adjacency is row-level, as everywhere in
    this family — bound per-entity contribution first for user-level
    guarantees.

    Scale shape: ONE map-side-combined groupBy shuffle; noise is the
    usual literal-table lookup on the aggregated relation; the
    threshold filter prunes before the global top-k, which plans as
    TakeOrderedAndProject (per-partition partial top-k, never a full
    sort); rank attaches via a window over the k survivors only.
    Deterministic total order: (noisy count desc, key asc)."""
    noisy = dp_noisy_count(
        df, group_cols, epsilon=epsilon, seed=seed, alias=alias
    )
    keys = [F.col(c).asc_nulls_first() for c in group_cols]
    order = [F.col(alias).desc(), *keys]
    topk = noisy.filter(
        F.col(alias) >= F.lit(int(threshold)).cast("long")
    ).orderBy(*order).limit(int(k))
    w = Window.orderBy(*order)
    return topk.select(
        *group_cols, alias, F.row_number().over(w).cast("long").alias("rank")
    )


def duck_dp_stable_topk_sql(
    table: str,
    group_cols: list[str],
    epsilon: float = 1.0,
    threshold: int = 10,
    k: int = 10,
    seed: str = "dbmask-dp",
    alias: str = "noisy_count",
) -> str:
    """DuckDB twin of :func:`dp_stable_topk` — same noisy counts, same
    deterministic (count desc, key asc) order, same threshold + top-k."""
    inner = duck_dp_noisy_count_sql(
        table, group_cols, epsilon=epsilon, seed=seed, alias=alias
    )
    cols = ", ".join(group_cols)
    order = f"{alias} DESC, " + ", ".join(
        f"{c} ASC NULLS FIRST" for c in group_cols
    )
    return f"""
    WITH noisy AS ({inner}),
    topk AS (SELECT * FROM noisy WHERE {alias} >= {int(threshold)}
             ORDER BY {order} LIMIT {int(k)})
    SELECT {cols}, {alias},
           CAST(row_number() OVER (ORDER BY {order}) AS BIGINT) AS rank
    FROM topk
    """


def recursive_cl_diversity_stats(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
    c: int = 3,
) -> DataFrame:
    """Recursive (c,l)-diversity audit (Machanavajjhala et al., TKDD'07
    §4.2) — the guard :func:`l_diversity_stats` misses: a class can hold
    l distinct sensitive values yet be 95% one of them (the skewness
    attack). Per equivalence class, with sensitive-value frequencies
    sorted descending r1 >= r2 >= ... >= rm, the class passes iff
    ``r1 < c * (r_l + r_{l+1} + ... + r_m)`` — the most frequent value
    must not dominate the tail that starts at the l-th value.

    All-integer arithmetic (counts, sums, one multiply by the integer
    ``c``), so the audit is bit-exact cross-engine; the tail sum is
    order-stable under ties because tied frequencies contribute equally
    wherever the slice boundary falls.

    Scale shape: two map-side-combined groupBy shuffles (class x
    sensitive, then class) — the collected frequency list is bounded by
    the sensitive column's per-class cardinality, which a release with
    meaningful l has already bounded."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    cell = df.groupBy(
        *[F.col(f"`{q}`") for q in quasi_cols],
        F.col(f"`{sensitive_col}`"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    freqs = F.sort_array(F.collect_list("_cnt"), asc=False)
    tail = F.expr(
        f"aggregate(slice(_freqs, {int(l)}, "
        f"greatest(0, size(_freqs) - {int(l) - 1})), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        cell.groupBy(*[F.col(f"`{q}`") for q in quasi_cols])
        .agg(
            F.sum("_cnt").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("n_sensitive"),
            freqs.alias("_freqs"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            F.element_at("_freqs", 1).alias("top_count"),
            tail.alias("tail_sum"),
            (
                F.element_at("_freqs", 1) < F.lit(int(c)) * tail
            ).alias("cl_diverse"),
        )
    )


def duck_recursive_cl_diversity_sql(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
    c: int = 3,
) -> str:
    """DuckDB twin of :func:`recursive_cl_diversity_stats` — same sorted
    frequency list, same integer tail-sum comparison."""
    q = ", ".join(quasi_cols)
    return f"""
    WITH cell AS (
      SELECT {q}, {sensitive_col}, CAST(count(*) AS BIGINT) AS _cnt
      FROM {table} GROUP BY {q}, {sensitive_col}),
    cls AS (
      SELECT {q}, CAST(sum(_cnt) AS BIGINT) AS class_size,
        CAST(count(*) AS BIGINT) AS n_sensitive,
        list_sort(list(_cnt), 'DESC') AS _freqs
      FROM cell GROUP BY {q})
    SELECT {q}, class_size, n_sensitive,
      _freqs[1] AS top_count,
      CAST(COALESCE(list_sum(_freqs[{int(l)}:]), 0) AS BIGINT) AS tail_sum,
      _freqs[1] < {int(c)} * CAST(COALESCE(list_sum(_freqs[{int(l)}:]), 0)
        AS BIGINT) AS cl_diverse
    FROM cls
    """
