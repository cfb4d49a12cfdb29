"""Deterministic record synthesis from the driver's ``customer`` table.

The driver testdata has no entity-resolution-shaped table, so the
oracle-checked linkage queries derive one from ``customer``
deterministically: each customer row becomes a base record ``a<key>``
plus a perturbed duplicate ``b<key>`` (and a second duplicate
``c<key>`` for every 5th key).  Perturbations mirror the reference's
noise classes (case flips, punctuation, phone reformatting, state
code<->name swap, the 'un' country quirk, one-char typos) and are
expressed BOTH as Spark expressions over span-documents and as a
DuckDB CTE over flat columns — the two must normalize identically,
which is exactly what the driver's oracle verifies.

Perturbation plan (k = c_custkey):
  * every copy: name upper-cased, phone reformatted, email upper-cased,
    address 'Street'->'St.', state code->full name, country 'USA'->'un'
    (all cancelled by normalizers);
  * k % 7 == 0:  one-char typo appended to the copy's name
                 (normalized names diverge; phone/email anchors hold);
  * k % 11 == 0: copy gets a different phone (name/email anchors hold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import US_STATE_CODES, US_STATES

# 10-digit codes: k*m % p with p the largest PRIME below 1e10 and m a
# large digit-soup multiplier — a bijection of k (p prime) that
# spreads over the full 10-digit space for small k too.  Traps found
# empirically on the way here:
#   * small multipliers (7919): codes for k <= ~1500 all start "00..",
#     and the shared prefix pushes cross-entity email RO similarity
#     over the 0.8 rule-mask threshold;
#   * structured multipliers (repunit 7777777777): 9m = -7 mod 1e10,
#     so entities 9 keys apart get phone codes differing by 7;
#   * ANY modulus with factors of 10: dk divisible by 1000 makes the
#     code delta m*dk end in "000", i.e. systematic shared trailing
#     digits between entities 1000 keys apart.  A prime modulus has no
#     decimal structure in its deltas.
# Overflow-safe: k up to ~1e9 keeps k*m within int64 for both Spark
# (ANSI mode) and DuckDB.
_DIGIT_A = 8_764_325_981
_DIGIT_B = 6_949_387_117
_DIGIT_C = 5_915_587_277
_MOD = 9_999_999_967

# word pools for synthetic names/emails: distinct entities must get
# genuinely distinct names (deriving names from the sequential
# "Customer#00000000N" strings makes ADJACENT customers ~0.94 similar
# and the rule masks merge the whole table into one cluster).
_FIRSTS = (
    "james mary robert patricia john jennifer michael linda david "
    "elizabeth william barbara richard susan joseph jessica thomas "
    "sarah charles karen christopher lisa daniel nancy matthew betty "
    "anthony margaret mark sandra donald ashley steven kimberly paul "
    "emily andrew donna joshua michelle kenneth carol kevin amanda "
    "brian melissa george deborah timothy stephanie ronald rebecca "
    "edward sharon jason laura jeffrey cynthia ryan kathleen"
).split()  # 60 entries

_LASTS = (
    "smith johnson williams brown jones garcia miller davis rodriguez "
    "martinez hernandez lopez gonzalez wilson anderson thomas taylor "
    "moore jackson martin lee perez thompson white harris sanchez "
    "clark ramirez lewis robinson walker young allen king wright "
    "scott torres nguyen hill flores green adams nelson baker hall "
    "rivera campbell mitchell carter roberts gomez phillips evans "
    "turner diaz parker cruz edwards collins reyes stewart"
).split()  # 61 entries

# middle-name pool, disjoint from _FIRSTS and _LASTS: normalize_name
# SORTS tokens, so drawing first and middle from one pool makes
# swapped picks (k1 = a + 60b, k2 = b + 60a) normalize identically and
# rule mask 4 (name==1.0) merges the two entities.  With 3 disjoint
# pools the sorted token multiset is injective in (first,middle,last),
# giving distinct normalized names for k < 60*59*61 = 215,940.
_MIDDLES = (
    "abbott becker caldwell dalton ellison foster grayson hubbard "
    "ingram jarvis keller lambert mercer norwood osborne prescott "
    "quimby radford sawyer thornton underwood vasquez whitfield xiong "
    "yates zimmerman ainsley barlow conway dempsey everhart fairchild "
    "godfrey hollis irwin jennings kendrick lockhart mcallister newell "
    "ogden pemberton quinlan rutledge sheffield tatum upton vaughn "
    "wexler yeager zeller ashford bradshaw crowley donovan emerson "
    "falkner gentry hammond"
).split()  # 59 entries

_DOMAINS = (
    "example.com", "mailhost.net", "corpmail.org",
    "webmail.io", "postbox.co", "bizmail.biz",
)


# ------------------------------------------------------------------
# Spark side
# ------------------------------------------------------------------


def _digits10(k: Column, mult: int, add: int) -> Column:
    return F.lpad(((k * mult + add) % _MOD).cast("string"), 10, "0")


def _state_code(k: Column) -> Column:
    return F.upper(
        F.element_at(
            F.array(*[F.lit(c) for c in US_STATE_CODES]),
            (k % 51).cast("int") + 1,
        )
    )


def _state_full(k: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(US_STATES[c]) for c in US_STATE_CODES]),
        (k % 51).cast("int") + 1,
    )


def _pool_pick(pool: tuple[str, ...] | list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(w) for w in pool]), idx.cast("int") + 1)


def _base_fields(cust: DataFrame) -> DataFrame:
    k = F.col("c_custkey")
    d = _digits10(k, _DIGIT_A, 12345)
    # mixed-radix pool picks: (first, middle, last) is a bijection of
    # k below 60*59*61 = 215,940, so entities get distinct full names
    # at every tested scale — with a 2-word 58x61 scheme, name==1.0
    # (rule mask 4, main_ldu_ldu.py:274) merged distinct entities into
    # giant clusters once row counts passed a few thousand.
    first = _pool_pick(_FIRSTS, k % len(_FIRSTS))
    middle = _pool_pick(
        _MIDDLES, (k / len(_FIRSTS)).cast("long") % len(_MIDDLES)
    )
    last = _pool_pick(
        _LASTS,
        (k / (len(_FIRSTS) * len(_MIDDLES))).cast("long") % len(_LASTS),
    )
    return cust.select(
        k.alias("k"),
        F.concat(
            F.initcap(first), F.lit(" "), F.initcap(middle), F.lit(" "),
            F.initcap(last),
        ).alias("name"),
        d.alias("digits"),
        _digits10(k, _DIGIT_B, 54321).alias("digits_alt"),
        # local part = 20 pseudo-random digits (two independent draws),
        # no name tokens: with shared name tokens the cross-entity RO
        # floor for same-domain pairs was ~0.77, and with only 10
        # digits the shared domain (13 of 23 chars) meant gestalt
        # digit-luck of 7/10 — hit by a few percent of random pairs —
        # crossed the 0.8 threshold in self-rule mask 2.  At 20 digits
        # the 0.8 threshold needs ~13/20 digit overlap: negligible.
        F.concat(
            _digits10(k, _DIGIT_B, 54321),
            _digits10(k, _DIGIT_C, 77777),
            F.lit("@"), _pool_pick(_DOMAINS, k % len(_DOMAINS)),
        ).alias("email"),
        F.lower(F.col("c_mktsegment")).alias("grp"),
        F.concat(
            ((k % 9999) + 1).cast("string"),
            F.lit(" "),
            F.lower(F.col("c_mktsegment")),
            F.lit(" Street"),
        ).alias("address"),
        F.concat(F.lit("city"), (k % 97).cast("string")).alias("city"),
        _state_code(k).alias("state_code"),
        _state_full(k).alias("state_full"),
        F.lpad((k % 100000).cast("string"), 5, "0").alias("zip"),
    )


def _fmt_phone_a(d: Column) -> Column:
    return F.concat(
        F.lit("("), F.substring(d, 1, 3), F.lit(") "),
        F.substring(d, 4, 3), F.lit("-"), F.substring(d, 7, 4),
    )


def _fmt_phone_b(d: Column) -> Column:
    return F.concat(
        F.substring(d, 1, 3), F.lit("-"),
        F.substring(d, 4, 3), F.lit("-"), F.substring(d, 7, 4),
    )


def synth_records(cust: DataFrame, with_c_copy: bool = True) -> DataFrame:
    """Flat synthetic record table (doc_id + raw fields) — the Spark
    twin of ``synth_sql_cte``."""
    base = _base_fields(cust)
    k = F.col("k")

    def flat(
        doc_prefix: str, name: Column, phone: Column, email: Column,
        address: Column, state: Column, country: Column,
    ) -> DataFrame:
        return base.select(
            F.concat(F.lit(doc_prefix), F.lpad(k.cast("string"), 9, "0")).alias(
                "doc_id"
            ),
            name.alias("name"),
            phone.alias("phone"),
            email.alias("email"),
            F.col("grp").alias("grp"),
            address.alias("address"),
            F.col("city").alias("city"),
            state.alias("state"),
            F.col("zip").alias("zip"),
            country.alias("country"),
        )

    a = flat(
        "a",
        F.col("name"),
        _fmt_phone_a(F.col("digits")),
        F.col("email"),
        F.col("address"),
        F.col("state_code"),
        F.lit("USA"),
    )
    b_name = F.when(
        k % 7 == 0, F.concat(F.upper(F.col("name")), F.lit("x"))
    ).otherwise(F.upper(F.col("name")))
    b_phone = F.when(
        k % 11 == 0, _fmt_phone_b(F.col("digits_alt"))
    ).otherwise(_fmt_phone_b(F.col("digits")))
    b = flat(
        "b",
        b_name,
        b_phone,
        F.upper(F.col("email")),
        F.replace(F.col("address"), F.lit("Street"), F.lit("St.")),
        F.col("state_full"),
        F.lit("un"),
    )
    out = a.unionByName(b)
    if with_c_copy:
        c = flat(
            "c",
            F.lower(F.col("name")),
            _fmt_phone_a(F.col("digits")),
            F.col("email"),
            F.col("address"),
            F.col("state_code"),
            F.lit("United States"),
        ).where(k % 5 == 0)
        out = out.unionByName(c)
    return out


_SPAN_FIELDS = (
    "name", "phone", "email", "grp", "address", "city", "state", "zip",
    "country",
)
_KIND_OF = {"grp": "group"}


def synth_documents(cust: DataFrame, with_c_copy: bool = True) -> DataFrame:
    """Interleaved span documents (doc_id, spans) built from the flat
    synthetic records — feeds the REAL engine path (span codec ->
    normalize -> block -> score -> cluster).  A media span is
    interleaved into every 3rd document (inert, invariant-checked)."""
    flat = synth_records(cust, with_c_copy)
    spans = []
    offset = 0
    spans.append(
        F.struct(
            F.lit("_source").alias("kind"),
            F.lit("ldu").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(offset).cast("int").alias("offset"),
        )
    )
    for f_name in _SPAN_FIELDS:
        offset += 1
        spans.append(
            F.struct(
                F.lit(_KIND_OF.get(f_name, f_name)).alias("kind"),
                F.col(f_name).cast("string").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(offset).cast("int").alias("offset"),
            )
        )
    media = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.concat(F.lit("img://"), F.col("doc_id")).alias("media_ref"),
        F.lit(offset + 1).cast("int").alias("offset"),
    )
    spans_arr = F.when(
        _media_pick(F.col("doc_id")), F.array(*spans, media)
    ).otherwise(F.array(*spans))
    return flat.select("doc_id", spans_arr.alias("spans"))


def _media_pick(doc_id: Column) -> Column:
    """Deterministic ~1/3 selection of docs that carry a media span.
    md5-based (not crc32) so the DuckDB oracle can replicate it —
    see ``sql_media_pick``."""
    return (
        F.conv(F.substring(F.md5(doc_id), 1, 2), 16, 10).cast("int") % 3 == 0
    )


def sql_media_pick(doc_id: str) -> str:
    """DuckDB twin of ``_media_pick``."""
    return f"(('0x' || substr(md5({doc_id}), 1, 2))::INT % 3 = 0)"


# ------------------------------------------------------------------
# DuckDB side (oracle CTE)
# ------------------------------------------------------------------


def synth_sql_cte(with_c_copy: bool = True) -> str:
    """DuckDB CTE text producing the identical flat record table from
    the pre-registered ``customer`` view.  Keep in lockstep with
    ``synth_records``."""
    codes = ", ".join(f"'{c.upper()}'" for c in US_STATE_CODES)
    fulls = ", ".join(f"'{US_STATES[c]}'" for c in US_STATE_CODES)
    firsts = ", ".join(f"'{w}'" for w in _FIRSTS)
    middles = ", ".join(f"'{w}'" for w in _MIDDLES)
    lasts = ", ".join(f"'{w}'" for w in _LASTS)
    domains = ", ".join(f"'{w}'" for w in _DOMAINS)
    nf, nm, nl = len(_FIRSTS), len(_MIDDLES), len(_LASTS)
    first = f"([{firsts}])[CAST(c_custkey % {nf} AS INT) + 1]"
    middle = f"([{middles}])[CAST((c_custkey // {nf}) % {nm} AS INT) + 1]"
    last = f"([{lasts}])[CAST((c_custkey // {nf * nm}) % {nl} AS INT) + 1]"
    domain = f"([{domains}])[CAST(c_custkey % {len(_DOMAINS)} AS INT) + 1]"
    cap = "upper(substr({w}, 1, 1)) || substr({w}, 2, 100)"
    base = f"""
        SELECT c_custkey AS k,
               {cap.format(w=first)} || ' ' || {cap.format(w=middle)} || ' ' || {cap.format(w=last)} AS name,
               lpad(CAST((c_custkey * {_DIGIT_A} + 12345) % {_MOD} AS VARCHAR), 10, '0') AS digits,
               lpad(CAST((c_custkey * {_DIGIT_B} + 54321) % {_MOD} AS VARCHAR), 10, '0') AS digits_alt,
               lpad(CAST((c_custkey * {_DIGIT_B} + 54321) % {_MOD} AS VARCHAR), 10, '0') || lpad(CAST((c_custkey * {_DIGIT_C} + 77777) % {_MOD} AS VARCHAR), 10, '0') || '@' || {domain} AS email,
               lower(c_mktsegment) AS grp,
               CAST((c_custkey % 9999) + 1 AS VARCHAR) || ' ' || lower(c_mktsegment) || ' Street' AS address,
               'city' || CAST(c_custkey % 97 AS VARCHAR) AS city,
               ([{codes}])[CAST(c_custkey % 51 AS INT) + 1] AS state_code,
               ([{fulls}])[CAST(c_custkey % 51 AS INT) + 1] AS state_full,
               lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS zip
        FROM customer
    """
    phone_a = "'(' || substr(digits, 1, 3) || ') ' || substr(digits, 4, 3) || '-' || substr(digits, 7, 4)"
    phone_b_ok = "substr(digits, 1, 3) || '-' || substr(digits, 4, 3) || '-' || substr(digits, 7, 4)"
    phone_b_alt = "substr(digits_alt, 1, 3) || '-' || substr(digits_alt, 4, 3) || '-' || substr(digits_alt, 7, 4)"
    a = f"""
        SELECT 'a' || lpad(CAST(k AS VARCHAR), 9, '0') AS doc_id,
               name, {phone_a} AS phone, email, grp, address, city,
               state_code AS state, zip, 'USA' AS country
        FROM synth_base
    """
    b = f"""
        SELECT 'b' || lpad(CAST(k AS VARCHAR), 9, '0') AS doc_id,
               CASE WHEN k % 7 = 0 THEN upper(name) || 'x' ELSE upper(name) END AS name,
               CASE WHEN k % 11 = 0 THEN {phone_b_alt} ELSE {phone_b_ok} END AS phone,
               upper(email) AS email, grp,
               replace(address, 'Street', 'St.') AS address, city,
               state_full AS state, zip, 'un' AS country
        FROM synth_base
    """
    c = f"""
        SELECT 'c' || lpad(CAST(k AS VARCHAR), 9, '0') AS doc_id,
               lower(name) AS name, {phone_a} AS phone, email, grp,
               address, city, state_code AS state, zip,
               'United States' AS country
        FROM synth_base
        WHERE k % 5 = 0
    """
    parts = [a, b] + ([c] if with_c_copy else [])
    return (
        # MATERIALIZED: DuckDB 1.0 inlines CTEs per reference — the
        # twins read synth_base 3x (a/b/c copies) and synth 2-6x, so
        # the name/state array-indexing expressions would re-run per
        # reference (byte-identical output either way)
        f"synth_base AS MATERIALIZED ({base}),\n"
        f"        synth AS MATERIALIZED ("
        + " UNION ALL ".join(parts)
        + ")"
    )
