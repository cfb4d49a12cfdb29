"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

All native Column chains (whole-stage codegen); each has a DuckDB SQL
twin for the driver oracle.  These operate on the flat corpus shape
``documents(doc_id, text, lang, source, n_chars)`` or any string
column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny frozen stopword sets per language for the n-gram/stopword-vote
# language heuristic (public common-word lists)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "con", "para", "del"),
}


def tokens(c: Column) -> Column:
    """Whitespace + punctuation tokenization (BPE-ish regex split):
    lowercase, split on non-alphanumerics."""
    return F.filter(
        F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), "
        f"t -> t != '')"
    )


def shingles_of_tokens(toks: Column, w: int = 3) -> Column:
    """Distinct w-word shingles (Broder resemblance sketch units) from
    a token-array column.  Docs shorter than ``w`` tokens contribute a
    single whole-doc shingle, so every non-empty doc has >= 1 shingle.

    Pass an *attribute* (a materialized column, e.g. behind an
    ``explode(array(tokens(...)))`` barrier) in hot paths: ``toks`` is
    referenced inside a per-element lambda, so a derived expression
    would be re-evaluated once per shingle position."""
    if w <= 1:
        return F.array_distinct(toks)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - w),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j + 1) for j in range(w)]
            ),
        )
    )
    short = F.when(
        F.size(toks) > 0,
        F.array(F.array_join(toks, " ")),
    ).otherwise(F.array().cast("array<string>"))
    return F.when(F.size(toks) >= w, grams).otherwise(short)


def char_ngrams(
    c: Column, n: int = 5, prenormalized: bool = False
) -> Column:
    """Distinct character n-grams (script-agnostic sketch units —
    VERDICT r4 item 6): lowercase, collapse whitespace runs to one
    space, then slide an n-char window.  Word tokenization makes an
    unsegmented CJK document ONE giant token (the `[^a-z0-9]+` split
    even deletes it outright), so shingle/minhash/Jaccard signals
    vanish; character n-grams are the published fallback that works
    for any script (and still behaves sanely on spaced Latin text).
    Texts shorter than ``n`` chars contribute a single whole-text
    gram, mirroring ``shingles_of_tokens``'s short-doc convention.

    ``prenormalized=True`` skips the lower/collapse wrapper — pass it
    with a MATERIALIZED already-normalized attribute in hot paths:
    ``norm`` is referenced inside the per-gram lambda, so an inline
    normalizer chain would re-evaluate once per gram (the
    ``shingles_of_tokens`` caveat, quadratic here)."""
    norm = (
        c
        if prenormalized
        else F.trim(F.regexp_replace(F.lower(c), "[ \t\r\n]+", " "))
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )
    short = F.when(
        F.length(norm) > 0, F.array(norm)
    ).otherwise(F.array().cast("array<string>"))
    return F.when(F.length(norm) >= n, grams).otherwise(short)


def sql_char_ngrams(
    expr: str, n: int = 5, prenormalized: bool = False
) -> str:
    nrm = (
        expr
        if prenormalized
        else f"trim(regexp_replace(lower({expr}), '[ \\t\\r\\n]+', ' ', 'g'))"
    )
    grams = (
        f"list_distinct([substr({nrm}, i, {n}) "
        f"for i in range(1, length({nrm}) - {n - 2})])"
    )
    return (
        f"(CASE WHEN length({nrm}) >= {n} THEN {grams} "
        f"WHEN length({nrm}) > 0 THEN [{nrm}] "
        f"ELSE [] END)"
    )


def shingles(c: Column, w: int = 3) -> Column:
    """w-word shingles of a raw text column (convenience; tokenizes
    inline — use ``shingles_of_tokens`` behind a barrier in hot paths).
    """
    return shingles_of_tokens(tokens(c), w)


def sql_shingles(expr: str, w: int = 3) -> str:
    toks = sql_tokens(expr)
    if w <= 1:
        return f"list_distinct({toks})"
    joined = " || ' ' || ".join(f"({toks})[i+{j}]" for j in range(w))
    grams = (
        f"list_distinct([ {joined} for i in range(1, len({toks}) - {w - 2}) ])"
    )
    return (
        f"(CASE WHEN len({toks}) >= {w} THEN {grams} "
        f"WHEN len({toks}) > 0 THEN [array_to_string({toks}, ' ')] "
        f"ELSE [] END)"
    )


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def sql_token_count(expr: str) -> str:
    return f"CAST(len({sql_tokens(expr)}) AS BIGINT)"


def _lang_hits(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(c: Column) -> Column:
    """Stopword-vote language heuristic: language with the most marker
    hits; ties and zero hits -> 'und' (deterministic order en,fr,de,es).
    """
    toks = tokens(c)
    hits = {lang: _lang_hits(toks, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (en highest priority)
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def sql_lang_id(expr: str) -> str:
    toks = sql_tokens(expr)
    hit = {
        lang: (
            f"len(list_filter({toks}, t -> list_contains("
            + "["
            + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
            + "], t)))"
        )
        for lang in LANG_MARKERS
    }
    best = "greatest(" + ", ".join(hit.values()) + ")"
    out = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        out = (
            f"CASE WHEN {hit[lang]} > 0 AND {hit[lang]} = {best} "
            f"THEN '{lang}' ELSE {out} END"
        )
    return out


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    mean-token-length band + English stopword presence.  Weights are
    fixed and documented; intended for corpus filtering, not ranking.
    """
    n_chars = F.length(c).cast("double")
    toks = tokens(c)
    n_toks = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z ]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    sw_hits = _lang_hits(toks, "en").cast("double")
    sw_ratio = F.when(n_toks > 0, sw_hits / n_toks).otherwise(F.lit(0.0))
    score = (
        F.when((n_chars >= 100) & (n_chars <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.lit(0.25) * alpha_ratio
        + F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(0.25)).otherwise(
            F.lit(0.0)
        )
        + F.lit(0.25) * F.least(F.lit(1.0), sw_ratio * 4)
    )
    return F.round(score, 6)


def sql_quality_score(expr: str) -> str:
    toks = sql_tokens(expr)
    en = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    n_chars = f"CAST(length({expr}) AS DOUBLE)"
    n_toks = f"CAST(len({toks}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace(lower({expr}), '[^a-z ]', '', 'g')) AS DOUBLE)"
    alpha_ratio = f"(CASE WHEN {n_chars} > 0 THEN {alpha} / {n_chars} ELSE 0.0 END)"
    mean_tok = f"(CASE WHEN {n_toks} > 0 THEN {n_chars} / {n_toks} ELSE 0.0 END)"
    sw_hits = f"CAST(len(list_filter({toks}, t -> list_contains([{en}], t))) AS DOUBLE)"
    sw_ratio = f"(CASE WHEN {n_toks} > 0 THEN {sw_hits} / {n_toks} ELSE 0.0 END)"
    return (
        "round("
        f"(CASE WHEN {n_chars} >= 100 AND {n_chars} <= 20000 THEN 0.25 ELSE 0.0 END)"
        f" + 0.25 * {alpha_ratio}"
        f" + (CASE WHEN {mean_tok} >= 3.0 AND {mean_tok} <= 12.0 THEN 0.25 ELSE 0.0 END)"
        f" + 0.25 * least(1.0, {sw_ratio} * 4)"
        ", 6)"
    )


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """All (overlapping, order-preserving) word n-grams of a token
    array — NOT distinct, unlike ``shingles_of_tokens``: repetition
    statistics need the multiset.  Docs shorter than ``n`` tokens
    yield an empty array.

    Pass an *attribute* (materialized column) in hot paths — ``toks``
    is referenced inside a per-element lambda (see
    ``shingles_of_tokens``)."""
    if n <= 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_ngrams(toks_expr: str, n: int) -> str:
    if n <= 1:
        return toks_expr
    joined = " || ' ' || ".join(f"({toks_expr})[i+{j}]" for j in range(n))
    return (
        f"(CASE WHEN len({toks_expr}) >= {n} "
        f"THEN [ {joined} for i in range(1, len({toks_expr}) - {n - 2}) ] "
        f"ELSE [] END)"
    )


def max_run_count(arr: Column) -> Column:
    """Highest multiplicity of any element in a string array, computed
    row-locally in O(n log n): sort, then one linear fold counting the
    longest equal run (struct-state ``aggregate`` — whole-stage
    codegen, no shuffle, no O(n^2) per-element rescan)."""
    srt = F.array_sort(arr)

    def merge(acc: Column, x: Column) -> Column:
        run = (
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        merge,
        lambda acc: acc["best"],
    )


def sql_max_run_count(arr_expr: str) -> str:
    """DuckDB twin of ``max_run_count``.  The oracle runs at test
    scale, so the O(n^2) distinct-rescan comprehension is fine."""
    return (
        f"(CASE WHEN len({arr_expr}) = 0 THEN 0 ELSE "
        f"list_max(list_transform(list_distinct({arr_expr}), "
        f"x -> len(list_filter({arr_expr}, y -> y = x)))) END)"
    )


# PII patterns: character classes + bounded quantifiers only — no
# lookaround/backrefs, so Java regex (Spark) and RE2 (DuckDB) agree.
# Scrub order matters: emails first (their local parts contain digit
# runs), then IPs (dotted digit runs would otherwise be eaten by the
# looser phone pattern), then phones.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PII_PHONE_RE = "[+(]?\\d[\\d().\\s-]{6,}\\d"


def pii_scrub(c: Column) -> Column:
    """Mask PII spans in free text with typed placeholders — the
    redaction pass a training-data build runs before export.  Native
    ``regexp_replace`` chain (whole-stage codegen, no UDF).  Returns
    struct(text, n_emails, n_ips, n_phones); counts are per-stage so
    they equal the number of replacements made."""
    t0 = c
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IP_RE))
    t2 = F.regexp_replace(t1, PII_IP_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return F.struct(
        t3.alias("text"),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
    )


def sql_pii_scrub_cols(expr: str) -> dict[str, str]:
    """DuckDB twin of ``pii_scrub`` as named column expressions
    (RE2 needs the 'g' flag for replace-all; counts via
    regexp_extract_all)."""
    e, i, p = PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE
    t1 = f"regexp_replace({expr}, '{e}', '<EMAIL>', 'g')"
    t2 = f"regexp_replace({t1}, '{i}', '<IP>', 'g')"
    t3 = f"regexp_replace({t2}, '{p}', '<PHONE>', 'g')"
    return {
        "text": t3,
        "n_emails": f"CAST(len(regexp_extract_all({expr}, '{e}')) AS INT)",
        "n_ips": f"CAST(len(regexp_extract_all({t1}, '{i}')) AS INT)",
        "n_phones": f"CAST(len(regexp_extract_all({t2}, '{p}')) AS INT)",
    }


def doc_fingerprint(c: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized token
    stream (case/punctuation-insensitive) — the exact-dedup key."""
    return F.md5(F.array_join(tokens(c), " "))


def sql_doc_fingerprint(expr: str) -> str:
    return f"md5(array_to_string({sql_tokens(expr)}, ' '))"


def winnow_fingerprints(c: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprints [Schleimer/Wilkerson/Aiken, SIGMOD'03]:
    hash every word k-gram, slide a window of ``w`` hashes, keep each
    window's minimum — a deterministic ~1/w sample of the k-gram set
    that GUARANTEES any shared run of >= k+w-1 tokens between two docs
    contributes at least one shared fingerprint (the rolling-hash
    near-dup detector the brief names; robust where the whole-doc
    md5 of ``doc_fingerprint`` breaks on a single edit).

    Returns a distinct array<string> of selected k-gram md5s.  Docs
    shorter than ``k`` tokens fall back to one whole-doc hash (every
    non-empty doc fingerprints); fewer than ``w`` k-grams -> the
    global minimum.  Hashes are md5 over the space-joined k-gram so
    the DuckDB oracle reproduces the selection bit-for-bit.

    HOT-PATH WARNING: this single-expression form re-derives the gram
    chain once per window (interpreted HOF lambdas, no CSE) — use
    ``operators.dedup.winnow_fingerprint_table`` (staged behind
    Generate barriers; measured ~60x faster) for anything bigger than
    a few rows.
    """
    toks = tokens(c)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.try_element_at(toks, i + j + 1) for j in range(k)]
            )
        ),
    )
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(grams) - w),
            lambda j: F.array_min(F.slice(grams, j + 1, w)),
        )
    )
    short_doc = F.when(
        F.size(toks) > 0, F.array(F.md5(F.array_join(toks, " ")))
    ).otherwise(F.array().cast("array<string>"))
    return (
        F.when(F.size(toks) < k, short_doc)
        .when(F.size(grams) < w, F.array(F.array_min(grams)))
        .otherwise(mins)
    )


def sql_winnow_fingerprint_cte(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> str:
    """DuckDB twin of ``winnow_fingerprint_table``, as a CTE chain
    ending in ``fp(doc_id, fingerprint)``.  Staged for the same reason
    the Spark side is: inlining the gram comprehension into the
    window-minimum comprehension recomputes every md5 per window."""
    toks = sql_tokens(text_col)
    joined = " || ' ' || ".join(f"(t)[i+{j}]" for j in range(k))
    return f"""
    _wtok AS (
        SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
    ),
    _wg AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {k}
                    THEN [ md5({joined})
                           for i in range(1, len(t) - {k - 2}) ]
                    WHEN len(t) > 0
                    THEN [md5(array_to_string(t, ' '))]
                    ELSE [] END AS g
        FROM _wtok
    ),
    fp AS (
        SELECT doc_id,
               unnest(CASE WHEN len(g) >= {w}
                      THEN list_distinct(
                          [ list_min(g[j:j+{w - 1}])
                            for j in range(1, len(g) - {w - 2}) ])
                      WHEN len(g) > 0 THEN [list_min(g)]
                      ELSE [] END) AS fingerprint
        FROM _wg
    )"""


# ------------------------------------------------------------------
# URL canonicalization (web-corpus URL-level dedup key)
# ------------------------------------------------------------------

# tracking params stripped by the canonicalizer (the industry-standard
# set: UTM campaign tags + click ids)
_URL_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(c: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the URL-level dedup
    key a web-crawl pipeline groups by before content dedup (the same
    page is crawled under case-variant hosts, default ports, tracking
    params, fragments and trailing slashes):

      * scheme + host lowercased, leading ``www.`` and default
        ``:80``/``:443`` ports dropped;
      * path kept case-sensitive, trailing slashes dropped;
      * query params: tracking params (``utm_*``, ``fbclid``,
        ``gclid``, ``ref``) and empties removed, the rest SORTED so
        param order doesn't split the key;
      * fragment dropped.

    Pure native expressions (regexp + one filter/sort HOF pair) — no
    UDF, row-local, safe in a scan-side projection at any scale.
    """
    u = F.trim(c)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)),
            r"^www\.",
            "",
        ),
        r":(80|443)$",
        "",
    )
    pathqf = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathqf, r"^([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(pathqf, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_URL_TRACKING_RE),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def url_host(c: Column) -> Column:
    """Lowercased registrable-ish host (www/default-port stripped) —
    the per-site aggregation key (host-level quality/robots stats)."""
    rest = F.regexp_replace(F.trim(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    return F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)),
            r"^www\.",
            "",
        ),
        r":(80|443)$",
        "",
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (one list_filter lambda —
    NOT nested inside another lambda, per the DuckDB lambda-nesting
    bug note in normalizers.sql_soundex)."""
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    host = (
        f"regexp_replace(regexp_replace("
        f"lower(regexp_extract({rest}, '^([^/?#]*)', 1)), "
        f"'^www\\.', ''), ':(80|443)$', '')"
    )
    pathqf = f"regexp_replace({rest}, '^[^/?#]*', '')"
    path = (
        f"regexp_replace(regexp_extract({pathqf}, '^([^?#]*)', 1), "
        f"'/+$', '')"
    )
    query = f"regexp_extract({pathqf}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_URL_TRACKING_RE}')))"
    )
    qs = (
        f"CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    return f"{scheme} || '://' || {host} || {path} || {qs}"


def sql_url_host(expr: str) -> str:
    rest = f"regexp_replace(trim({expr}), '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    return (
        f"regexp_replace(regexp_replace("
        f"lower(regexp_extract({rest}, '^([^/?#]*)', 1)), "
        f"'^www\\.', ''), ':(80|443)$', '')"
    )
