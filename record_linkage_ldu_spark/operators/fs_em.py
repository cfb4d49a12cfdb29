"""EM estimation of Fellegi-Sunter match parameters (Winkler's
canonical fitting; Fellegi & Sunter 1969, Winkler 1988).

The reference — and this engine's `config.py` — carries the
agreement weights as fixed literals.  This module ESTIMATES them from
the candidate pairs themselves, unsupervised: per-field agreement
indicators gamma_i collapse every pair into one of 2^F patterns, EM
fits the two-class mixture

    P(gamma) = p * prod_i m_i^g_i (1-m_i)^(1-g_i)
             + (1-p) * prod_i u_i^g_i (1-u_i)^(1-g_i)

and the fitted (m_i, u_i) give each field's agreement / disagreement
likelihood ratios — the FS weights, learned instead of configured.

Scale shape: ONE groupBy over the scored pairs produces the 2^F
pattern counts (F = 4 here -> at most 16 rows, regardless of corpus
size); EM runs on those counts.  The driver-side loop touches only
the bounded count table — the classic trick that makes FS-EM a
one-aggregation algorithm at any scale.

Determinism / oracle parity: every floating-point reduction is an
ordered left fold over patterns sorted by pattern id, and every
product multiplies in declared field order — the generated DuckDB twin
(:func:`sql_estimate_fs_weights`, unrolled iterations with
``list_reduce`` over ``list(... ORDER BY g)``) performs bit-identical
IEEE arithmetic, so the driver hash check passes WITHOUT rounding
fudge.  No ``log``/``pow`` anywhere (libm results differ across
engines): weights are emitted as ratios m/u and (1-m)/(1-u).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fs_pattern_counts(
    scored_pairs: DataFrame, fields: tuple[str, ...], tau: float = 0.85
) -> DataFrame:
    """(g, c): agreement-pattern id and pair count.  Field i maps to
    bit (F-1-i), so the FIRST declared field is the high bit."""
    nf = len(fields)
    g = None
    for i, f in enumerate(fields):
        bit = F.when(F.col(f) >= F.lit(tau), F.lit(1 << (nf - 1 - i))).otherwise(
            F.lit(0)
        )
        g = bit if g is None else g + bit
    return (
        scored_pairs.select(g.alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c"))
    )


def fs_em(
    counts: list[tuple[int, int]],
    n_fields: int,
    iters: int = 10,
    p0: float = 0.1,
    m0: float = 0.8,
    u0: float = 0.2,
) -> dict:
    """EM on pattern counts.  ``counts`` MUST be sorted by pattern id
    ascending — the fold order is part of the contract (the SQL twin
    folds ``list(... ORDER BY g)`` the same way)."""
    masks = [1 << (n_fields - 1 - i) for i in range(n_fields)]
    p = p0
    m = [m0] * n_fields
    u = [u0] * n_fields
    for _ in range(iters):
        S = 0.0
        N = 0.0
        Sm = [0.0] * n_fields
        Su = [0.0] * n_fields
        for g, c in counts:
            a = p
            for i in range(n_fields):
                a = a * (m[i] if g & masks[i] else 1.0 - m[i])
            b = 1.0 - p
            for i in range(n_fields):
                b = b * (u[i] if g & masks[i] else 1.0 - u[i])
            cd = float(c)
            w = a / (a + b)
            S = S + (cd * w)
            N = N + cd
            for i in range(n_fields):
                if g & masks[i]:
                    Sm[i] = Sm[i] + (cd * w)
                    Su[i] = Su[i] + (cd * (1.0 - w))
                else:
                    Sm[i] = Sm[i] + 0.0
                    Su[i] = Su[i] + 0.0
        # clamp into (0, 1): EM saturating a parameter at exactly 0/1
        # (e.g. every matched pair agreeing on a field) would zero
        # a+b for some pattern next iteration (0/0).  Same clamp, same
        # literals, in the SQL twin.
        clamp = lambda x: min(max(x, 1e-9), 1.0 - 1e-9)  # noqa: E731
        p = clamp(S / N)
        m = [clamp(Sm[i] / S) for i in range(n_fields)]
        u = [clamp(Su[i] / (N - S)) for i in range(n_fields)]
    return {"p": p, "m": m, "u": u}


def estimate_fs_weights(
    spark: SparkSession,
    scored_pairs: DataFrame,
    fields: tuple[str, ...],
    tau: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """One row per field: estimated m, u, and the FS likelihood-ratio
    weights (w_agree = m/u, w_disagree = (1-m)/(1-u)), plus the fitted
    match prevalence p.  The only driver materialization is the 2^F
    pattern-count table (<= 16 rows at F=4) — bounded at any corpus
    size."""
    fit = fit_fs(scored_pairs, fields, tau, iters)
    out = [
        (
            f,
            fit["m"][i],
            fit["u"][i],
            fit["m"][i] / fit["u"][i],
            (1.0 - fit["m"][i]) / (1.0 - fit["u"][i]),
            fit["p"],
        )
        for i, f in enumerate(fields)
    ]
    return spark.createDataFrame(
        out, "field string, m double, u double, w_agree double, "
        "w_disagree double, p double"
    )


def sql_estimate_fs_weights(
    scored_chain: str,
    fields: tuple[str, ...],
    tau: float = 0.85,
    iters: int = 10,
    p0: float = 0.1,
    m0: float = 0.8,
    u0: float = 0.2,
) -> str:
    """Generated DuckDB twin: unrolled EM over the pattern-count CTE.
    ``scored_chain`` is a complete WITH-chain ending in a ``scored``
    relation carrying the per-field similarity columns.  Arithmetic
    mirrors :func:`fs_em` operation-for-operation (left folds over
    patterns ordered by g; products in field order)."""
    nf = len(fields)
    masks = [1 << (nf - 1 - i) for i in range(nf)]
    gexpr = " + ".join(
        f'CASE WHEN "{f}" >= {tau} THEN {masks[i]} ELSE 0 END'
        for i, f in enumerate(fields)
    )
    parts = [
        # MATERIALIZED: 10+ unrolled iterations reference pat; without
        # it DuckDB inlines the whole scored chain once per iteration
        f"pat AS MATERIALIZED (SELECT ({gexpr}) AS g, count(*) AS c "
        "FROM scored GROUP BY 1)",
        "it0 AS (SELECT "
        + f"CAST({p0} AS DOUBLE) AS p, "
        + ", ".join(f"CAST({m0} AS DOUBLE) AS m{i}" for i in range(nf))
        + ", "
        + ", ".join(f"CAST({u0} AS DOUBLE) AS u{i}" for i in range(nf))
        + ")",
    ]

    def fold(term: str) -> str:
        return (
            f"list_reduce(list(({term}) ORDER BY g), (x, y) -> x + y)"
        )

    for k in range(1, iters + 1):
        a = "i.p"
        b = "(1.0 - i.p)"
        for i in range(nf):
            a += (
                f" * (CASE WHEN t.g & {masks[i]} = {masks[i]} "
                f"THEN i.m{i} ELSE 1.0 - i.m{i} END)"
            )
            b += (
                f" * (CASE WHEN t.g & {masks[i]} = {masks[i]} "
                f"THEN i.u{i} ELSE 1.0 - i.u{i} END)"
            )
        parts.append(
            f"w{k} AS (SELECT t.g, CAST(t.c AS DOUBLE) AS c, "
            f"({a}) AS a, ({b}) AS b FROM pat t CROSS JOIN it{k - 1} i)"
        )
        sums = [
            fold("c * (a / (a + b))") + " AS S",
            fold("c") + " AS N",
        ]
        for i in range(nf):
            sums.append(
                fold(
                    f"CASE WHEN g & {masks[i]} = {masks[i]} "
                    f"THEN c * (a / (a + b)) ELSE 0.0 END"
                )
                + f" AS Sm{i}"
            )
            sums.append(
                fold(
                    f"CASE WHEN g & {masks[i]} = {masks[i]} "
                    f"THEN c * (1.0 - (a / (a + b))) ELSE 0.0 END"
                )
                + f" AS Su{i}"
            )
        def clamp(expr: str) -> str:
            return f"least(greatest({expr}, 1e-9), 1.0 - 1e-9)"

        upd = [clamp("s.S / s.N") + " AS p"]
        upd += [clamp(f"s.Sm{i} / s.S") + f" AS m{i}" for i in range(nf)]
        upd += [
            clamp(f"s.Su{i} / (s.N - s.S)") + f" AS u{i}" for i in range(nf)
        ]
        parts.append(
            f"it{k} AS (SELECT {', '.join(upd)} "
            f"FROM (SELECT {', '.join(sums)} FROM w{k}) s)"
        )
    branches = " UNION ALL ".join(
        f"SELECT '{f}' AS field, m{i} AS m, u{i} AS u, "
        f"m{i} / u{i} AS w_agree, "
        f"(1.0 - m{i}) / (1.0 - u{i}) AS w_disagree, p FROM it{iters}"
        for i, f in enumerate(fields)
    )
    return f"{scored_chain},\n    " + ",\n    ".join(parts) + f"\n    {branches}"


def fs_match_probability(
    scored_pairs: DataFrame,
    fit: dict,
    fields: tuple[str, ...],
    tau: float = 0.85,
) -> DataFrame:
    """Apply an :func:`fs_em` fit back to the pairs: posterior match
    probability under the fitted mixture,

        odds = p/(1-p) * prod_i (g_i ? m_i/u_i : (1-m_i)/(1-u_i))
        P(match | gamma) = odds / (1 + odds)

    — the estimate->apply loop closed: unsupervised weights scoring
    the very pairs they were fitted on (plus any new batch).  Pure
    literal arithmetic per row (the fit is 2F+1 doubles), no shuffle
    beyond what ``scored_pairs`` already carries."""
    nf = len(fields)
    prior = fit["p"] / (1.0 - fit["p"])
    odds = F.lit(prior)
    gcol = None
    for i, f in enumerate(fields):
        agree = F.col(f) >= F.lit(tau)
        r_a = fit["m"][i] / fit["u"][i]
        r_d = (1.0 - fit["m"][i]) / (1.0 - fit["u"][i])
        odds = odds * F.when(agree, F.lit(r_a)).otherwise(F.lit(r_d))
        bit = F.when(agree, F.lit(1 << (nf - 1 - i))).otherwise(F.lit(0))
        gcol = bit if gcol is None else gcol + bit
    return scored_pairs.select(
        "doc_id_1",
        "doc_id_2",
        gcol.cast("int").alias("g"),
        (odds / (F.lit(1.0) + odds)).alias("match_prob"),
    )


def sql_fs_match_probability(
    scored_chain: str,
    fields: tuple[str, ...],
    tau: float = 0.85,
    iters: int = 10,
    p0: float = 0.1,
    m0: float = 0.8,
    u0: float = 0.2,
) -> str:
    """DuckDB twin: re-runs the unrolled EM (same generated CTEs as
    :func:`sql_estimate_fs_weights`, so the same bits) and CROSS JOINs
    the 1-row fit onto the scored pairs with the identical
    multiplication order as :func:`fs_match_probability`."""
    nf = len(fields)
    masks = [1 << (nf - 1 - i) for i in range(nf)]
    fit_sql = sql_estimate_fs_weights(
        scored_chain, fields, tau, iters, p0, m0, u0
    )
    # keep everything up to (and including) the final it{iters} CTE;
    # drop the UNION ALL presentation tail
    head, _tail = fit_sql.rsplit("\n    SELECT '", 1)
    odds = "(i.p / (1.0 - i.p))"
    gexpr = " + ".join(
        f'CASE WHEN s."{f}" >= {tau} THEN {masks[i]} ELSE 0 END'
        for i, f in enumerate(fields)
    )
    for i, f in enumerate(fields):
        odds += (
            f' * (CASE WHEN s."{f}" >= {tau} '
            f"THEN i.m{i} / i.u{i} "
            f"ELSE (1.0 - i.m{i}) / (1.0 - i.u{i}) END)"
        )
    return f"""{head}
        SELECT s.doc_id_1, s.doc_id_2,
               CAST(({gexpr}) AS INT) AS g,
               ({odds}) / (1.0 + ({odds})) AS match_prob
        FROM scored s CROSS JOIN it{iters} i
    """


def fit_fs(
    scored_pairs: DataFrame,
    fields: tuple[str, ...],
    tau: float = 0.85,
    iters: int = 10,
) -> dict:
    """The shared collect-and-fit step: pattern counts (bounded 2^F
    driver materialization) -> sorted -> :func:`fs_em`.  Both
    :func:`estimate_fs_weights` and posterior scoring go through this,
    so tau/sort-order/iteration semantics can never drift apart."""
    rows = fs_pattern_counts(scored_pairs, fields, tau).collect()
    return fs_em(sorted((r["g"], r["c"]) for r in rows), len(fields), iters)


def fs_decisions(
    posterior: DataFrame, upper: float = 0.9, lower: float = 0.1
) -> DataFrame:
    """The Fellegi-Sunter THREE-WAY decision rule (the 1969 paper's
    actual output, which thresholded pipelines flatten to two): pairs
    above ``upper`` auto-link, below ``lower`` auto-reject, and the
    band between is routed to clerical review — the review queue whose
    size is the operating cost of the chosen thresholds.

    Input: :func:`fs_match_probability` output.  Output: one row per
    decision (``link`` / ``possible`` / ``non-link``) with pair count
    and mean posterior — the 3-row summary an operator tunes
    thresholds against.  One keyed groupBy, nothing driver-side.
    """
    return (
        posterior.select(
            F.when(F.col("match_prob") >= F.lit(upper), F.lit("link"))
            .when(F.col("match_prob") <= F.lit(lower), F.lit("non-link"))
            .otherwise(F.lit("possible"))
            .alias("decision"),
            "match_prob",
        )
        .groupBy("decision")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("match_prob"), 6).alias("avg_prob"),
        )
    )


def sql_fs_decisions(
    scored_chain: str,
    fields: tuple[str, ...],
    tau: float = 0.85,
    iters: int = 10,
    upper: float = 0.9,
    lower: float = 0.1,
) -> str:
    """DuckDB twin of :func:`fs_decisions` over the same EM fit."""
    inner = sql_fs_match_probability(scored_chain, fields, tau, iters)
    return f"""
        SELECT decision,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(match_prob), 6) AS avg_prob
        FROM (
            SELECT CASE WHEN match_prob >= {upper!r} THEN 'link'
                        WHEN match_prob <= {lower!r} THEN 'non-link'
                        ELSE 'possible' END AS decision,
                   match_prob
            FROM ({inner}) t
        ) g
        GROUP BY decision
    """
