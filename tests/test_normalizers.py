"""Golden vectors for the scalar normalizers (FIXTURES.md §4) and
parity between the Spark Column chains and the DuckDB oracle SQL
fragments."""

import duckdb
import pytest
from pyspark.sql import functions as F

from record_linkage_ldu_spark.functions import normalizers as N

GOLDEN = {
    "name": [
        # stopwords removed (co/inc/company/...), tokens sorted
        ("The Yarn Co., Inc.", "yarn"),
        ("Smith  & Johnson Company", "johnson smith"),
        ("ACME Trading LLC", "acme trading"),
        ("zeta alpha", "alpha zeta"),  # token sort
        ("New New York Deli", "deli new new york"),  # duplicate tokens kept
        ("", ""),
        ("or in me", "in me or"),  # state codes survive stopword removal
    ],
    "address": [
        ("365 Oyster Shell Drive", "365 drive oyster shell"),
        ("12 Main Street", "12 main"),  # street is an address stopword
        ("12 Main St.", "12 main"),
        ("Oak Road Square Ave", "oak"),
    ],
    "number": [
        ("(239) 555-0117", "2395550117"),
        ("+1 813 555 0000", "18135550000"),
        ("no digits", ""),
    ],
    "email": [
        # symbols -> SPACE, no sort (README.md:95)
        ("ABC@Gmail.com", "abc gmail com"),
        ("Zeta@Alpha.org", "zeta alpha org"),
        ("a.b@c.d", "b c"),  # 'a' and 'd' are single-letter... kept? see below
    ],
    "website": [
        ("www.YarnShop.com", "yarnshop com"),
        ("http://www.acme.co.uk", "http acme uk"),
    ],
}
# 'a.b@c.d': tokens a b c d; 'a'/'d' are english stopwords, 'b'/'c' not.
# 'co' removed only by NAME stopwords, email uses base list -> kept?
# base list has no 'co'; but 'co' in website case: 'co' not in base -> kept.
GOLDEN["email"][2] = ("a.b@c.d", "b c")
GOLDEN["website"][1] = ("http://www.acme.co.uk", "http acme co uk")


@pytest.mark.parametrize("kind", list(GOLDEN))
def test_normalizer_golden(spark, kind):
    fn = N.NORMALIZERS[kind]
    inputs = [x for x, _ in GOLDEN[kind]]
    expected = [y for _, y in GOLDEN[kind]]
    df = spark.createDataFrame([(x,) for x in inputs], ["v"])
    got = [r[0] for r in df.select(fn(F.col("v")).alias("o")).collect()]
    assert got == expected


@pytest.mark.parametrize("kind", list(GOLDEN))
def test_normalizer_sql_parity(spark, kind):
    """Spark chain and DuckDB fragment must agree exactly — this is
    what the driver's oracle relies on."""
    inputs = [x for x, _ in GOLDEN[kind]] + [
        "Mixed CASE 123 !@# tokens &",
        "   spaces   everywhere   ",
    ]
    df = spark.createDataFrame([(x,) for x in inputs], ["v"])
    spark_out = [
        r[0] for r in df.select(N.NORMALIZERS[kind](F.col("v")).alias("o")).collect()
    ]
    con = duckdb.connect()
    sql_fn = N.SQL_NORMALIZERS[kind]
    q = f"select {sql_fn('?::VARCHAR')}"
    nparams = q.count("?")
    duck_out = [
        con.execute(q, [x] * nparams).fetchone()[0] for x in inputs
    ]
    assert spark_out == duck_out


def test_null_propagation(spark):
    df = spark.createDataFrame([(None,)], "v string")
    for kind, fn in N.NORMALIZERS.items():
        out = df.select(fn(F.col("v")).alias("o")).collect()[0][0]
        assert out is None, kind


def test_fix_state(spark):
    df = spark.createDataFrame(
        [("FL",), ("Florida",), ("fl",), ("narnia",), ("NY",)], ["v"]
    )
    got = [r[0] for r in df.select(N.fix_state(F.col("v")).alias("o")).collect()]
    assert got == ["florida", "florida", "florida", "narnia", "new york"]


def test_fix_country(spark):
    df = spark.createDataFrame(
        [("un",), ("UN",), ("USA",), ("United States",), ("Deutschland",), ("xq",)],
        ["v"],
    )
    got = [r[0] for r in df.select(N.fix_country(F.col("v")).alias("o")).collect()]
    assert got == [
        "united states", "united states", "united states",
        "united states", "germany", "xq",
    ]


def test_sql_soundex_matches_spark(spark):
    """Pin the DuckDB soundex twin against Spark's F.soundex on the
    edge cases that define the automaton: h/w skip preserving the
    last code, vowel/non-letter separators, non-letter first char
    pass-through, truncation and padding."""
    import duckdb

    from record_linkage_ldu_spark.functions.normalizers import sql_soundex

    vals = [
        "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
        "honeyman", "", "x", "aeiou", "hhhh", "wwww", "bob", "o brien",
        "obrien", "llc", "smith", "smyth", "czarkowska", "a", "ab",
        "bcdlmn", "yx", "hx", "wx", "abb", "ab b", "ab1b", "1abc", "9",
        "a1", "bhb", "bwb", "byb", "b b", "robert123x", "ab-b",
        "christopher", "caldwell", "norwood",
    ]
    import pyspark.sql.functions as F

    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got_spark = {
        r["s"]: r["sx"]
        for r in sdf.select("s", F.soundex("s").alias("sx")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        got_duck = con.execute(f"select {sql_soundex(repr(v))}").fetchone()[0]
        assert got_duck == got_spark[v], (v, got_duck, got_spark[v])


def test_refined_soundex_vectors_and_sql_parity(spark):
    """Commons-Codec reference vectors, then Spark column == DuckDB
    twin on edge cases (the backref collapse vs the per-digit RE2
    chain must agree on every run shape)."""
    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.functions.normalizers import (
        refined_soundex,
        sql_refined_soundex,
    )

    vals = [
        "testing", "TESTING", "braz", "caren", "hayers", "lambert",
        "noulton", "o brien", "Schmidt", "", "  ", "123", "x",
        "aaabbb", "mississippi", "ab1b", "robert123x", "ZZZ", "bp",
        "smith", "smyth", "a-b-c",
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got_spark = {
        r["s"]: r["rs"]
        for r in sdf.select(
            "s", refined_soundex(F.col("s")).alias("rs")
        ).collect()
    }
    # reference vectors (Apache Commons Codec RefinedSoundex)
    assert got_spark["testing"] == "T6036084"
    assert got_spark["braz"] == "B1905"
    assert got_spark["caren"] == "C30908"
    assert got_spark["hayers"] == "H093"
    assert got_spark["lambert"] == "L7081096"
    assert got_spark["noulton"] == "N807608"
    assert got_spark[""] == ""
    assert got_spark["123"] == ""
    # same class collapses, different spellings split finer than
    # American soundex where classes differ
    assert got_spark["smith"] == got_spark["smyth"]
    con = duckdb.connect()
    for v in vals:
        got_duck = con.execute(
            f"select {sql_refined_soundex(repr(v))}"
        ).fetchone()[0]
        assert got_duck == got_spark[v], (v, got_duck, got_spark[v])


def test_nysiis_vectors_and_sql_parity(spark):
    """NYSIIS staged-recipe goldens (pinned semantics — see the
    normalizers.py recipe note), then Spark column == DuckDB twin on
    every value including the degenerate run shapes the global-pass
    order defines."""
    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.functions.normalizers import (
        nysiis,
        sql_nysiis,
    )

    vals = [
        "KNIGHT", "knight", "MACDONALD", "PHILLIPS", "SCHMIDT",
        "BROWN", "O'Brien", "mackenzie", "Knuth", "PFEIFFER",
        "WASHINGTON", "AARON", "HH", "XHH", "AWAW", "S", "A", "",
        "  ", "123", "ZHANG", "QUINN", "MEYER", "LEE", "DIAZ",
        "NGUYEN", "EVANS", "STEWART", "MATTHEWS", "DAY", "SHAW",
        "HAHN", "mc lean", "smith", "schmitt", "smyth", "a-b-c",
        "EVEV", "KNKN", "SCHSCH", "PHPH",
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got_spark = {
        r["s"]: r["ny"]
        for r in sdf.select("s", nysiis(F.col("s")).alias("ny")).collect()
    }
    # pinned goldens (classic NYSIIS rule set as ordered global passes)
    assert got_spark["KNIGHT"] == "NAGT"
    assert got_spark["knight"] == "NAGT"          # case-insensitive
    assert got_spark["PHILLIPS"] == "FALAP"
    assert got_spark["MACDONALD"] == "MCDANALD"
    assert got_spark["SCHMIDT"] == "SNAD"
    assert got_spark["PFEIFFER"] == "FAFAR"
    assert got_spark["O'Brien"] == "OBRAN"        # punctuation stripped
    assert got_spark[""] == ""
    assert got_spark["123"] == ""
    # the DT-tail rule splits what Soundex merges (S530 for both)
    assert got_spark["smith"] != got_spark["SCHMIDT"]
    # Y is NOT a NYSIIS vowel: smyth stays distinct from smith
    # (finer than Soundex, which codes both S530)
    assert got_spark["smith"] == "SNAT"
    assert got_spark["smyth"] == "SNYT"
    con = duckdb.connect()
    for v in vals:
        lit = "'" + v.replace("'", "''") + "'"
        got_duck = con.execute(f"select {sql_nysiis(lit)}").fetchone()[0]
        assert got_duck == got_spark[v], (v, got_duck, got_spark[v])
    # NULL -> NULL in both engines
    assert con.execute(f"select {sql_nysiis('NULL')}").fetchone()[0] is None
    got_null = (
        sdf.select(nysiis(F.lit(None).cast("string")).alias("ny"))
        .limit(1)
        .collect()[0]["ny"]
    )
    assert got_null is None


def test_canonical_given_name_parity_and_bridge(spark):
    """Nickname folding: dictionary hit folds, miss passes through,
    Spark == DuckDB on the whole dictionary; the folded soundex key
    bridges bob<->robert (raw soundex cannot: B100 vs R163)."""
    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.config import NICKNAME_ALIASES
    from record_linkage_ldu_spark.functions.normalizers import (
        canonical_given_name,
        sql_canonical_given_name,
    )

    vals = list(NICKNAME_ALIASES) + ["robert", "zzz-unknown", "", "Bob "]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got_spark = {
        r["s"]: r["c"]
        for r in sdf.select(
            "s", canonical_given_name(F.col("s")).alias("c")
        ).collect()
    }
    assert got_spark["bob"] == "robert"
    assert got_spark["Bob "] == "robert"     # trim + case-fold on probe
    assert got_spark["robert"] == "robert"   # formal name passes through
    assert got_spark["zzz-unknown"] == "zzz-unknown"
    con = duckdb.connect()
    for v in vals:
        lit = "'" + v.replace("'", "''") + "'"
        got_duck = con.execute(
            f"select {sql_canonical_given_name(lit)}"
        ).fetchone()[0]
        assert got_duck == got_spark[v], (v, got_duck, got_spark[v])
    # the bridge: folded-then-encoded keys collide for bob/robert
    folded = sdf.select(
        "s", F.soundex(canonical_given_name(F.col("s"))).alias("k")
    )
    keys = {r["s"]: r["k"] for r in folded.collect()}
    assert keys["bob"] == keys["robert"]
    raw = {
        r["s"]: r["k"]
        for r in sdf.select("s", F.soundex("s").alias("k")).collect()
    }
    assert raw["bob"] != raw["robert"]


def test_fold_accents_parity_and_goldens(spark):
    """Accent folding: NFD-derived 1:1 map + multi-char expansions,
    identical output from the Spark chain and the DuckDB twin; folding
    BEFORE normalize_name keeps 'müller' out of the 'mller' block."""
    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.functions.normalizers import (
        fold_accents,
        normalize_name,
        sql_fold_accents,
    )

    vals = [
        "müller", "Łódź", "Cœur", "Ærøskøbing", "François", "Dvořák",
        "straße", "Þórður", "İstanbul", "no accents", "", "ñandú",
        "Gödel-Escher", "señor", "crème brûlée", "ĐĦŧıð",
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["f"]
        for r in sdf.select("s", fold_accents(F.col("s")).alias("f")).collect()
    }
    assert got["müller"] == "muller"
    assert got["Łódź"] == "Lodz"
    assert got["Cœur"] == "Coeur"
    assert got["straße"] == "strasse"
    assert got["Ærøskøbing"] == "AEroskobing"
    assert got["no accents"] == "no accents"
    con = duckdb.connect()
    for v in vals:
        lit = "'" + v.replace("'", "''") + "'"
        d = con.execute(f"select {sql_fold_accents(lit)}").fetchone()[0]
        assert d == got[v], (v, got[v], d)
    # null propagation
    assert (
        sdf.select(fold_accents(F.lit(None).cast("string")).alias("f"))
        .limit(1)
        .collect()[0]["f"]
        is None
    )
    # the blocking motivation: folded-then-normalized keeps the vowel
    folded_norm = (
        sdf.where(F.col("s") == "müller")
        .select(normalize_name(fold_accents(F.col("s"))).alias("n"))
        .collect()[0]["n"]
    )
    raw_norm = (
        sdf.where(F.col("s") == "müller")
        .select(normalize_name(F.col("s")).alias("n"))
        .collect()[0]["n"]
    )
    assert folded_norm == "muller" and raw_norm == "mller"


def test_contact_canonicalization(spark):
    """Email aliasing (googlemail fold, plus-tag strip, gmail dot
    insensitivity) and E.164-lite phones: all gmail alias spellings
    collapse to one exact key; twins agree on every vector."""
    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.functions.normalizers import (
        canonical_email,
        canonical_phone,
        sql_canonical_email,
        sql_canonical_phone,
    )

    emails = [
        "John.Doe+news@GoogleMail.com ", "john.doe@gmail.com",
        "j.o.h.n.doe+a+b@gmail.com", "johndoe@gmail.com",
        "Jane.Roe@Example.com", "jane.roe+x@example.com",
        "not-an-email", "", "a.b@c.d@weird",
        # multi-@ multi-plus: Spark's regexp_replace is always global;
        # the DuckDB twin needs its explicit 'g' (review-caught parity
        # break — both plus segments must strip)
        "a+b@x+c@gmail.com", "++@@++",
    ]
    phones = [
        "(415) 555-0199", "+1 415 555 0199", "1-415-555-0199",
        "0044 20 7946 0958", "5551234", "", "ext. only",
    ]
    sdf = spark.createDataFrame([(v,) for v in emails], "s string")
    got_e = {
        r["s"]: r["c"]
        for r in sdf.select(
            "s", canonical_email(F.col("s")).alias("c")
        ).collect()
    }
    # the four gmail alias spellings collapse to one key
    assert (
        got_e["John.Doe+news@GoogleMail.com "]
        == got_e["john.doe@gmail.com"]
        == got_e["j.o.h.n.doe+a+b@gmail.com"]
        == got_e["johndoe@gmail.com"]
        == "johndoe@gmail.com"
    )
    # non-gmail keeps dots but sheds the plus-tag
    assert got_e["jane.roe+x@example.com"] == "jane.roe@example.com"
    assert got_e["Jane.Roe@Example.com"] == "jane.roe@example.com"
    assert got_e["not-an-email"] == "not-an-email"
    pdf = spark.createDataFrame([(v,) for v in phones], "s string")
    got_p = {
        r["s"]: r["c"]
        for r in pdf.select(
            "s", canonical_phone(F.col("s")).alias("c")
        ).collect()
    }
    assert (
        got_p["(415) 555-0199"]
        == got_p["+1 415 555 0199"]
        == got_p["1-415-555-0199"]
        == "+14155550199"
    )
    assert got_p["0044 20 7946 0958"] == "+442079460958"
    assert got_p["5551234"] == "+5551234"  # neither shape: digits kept
    assert got_p[""] == "" and got_p["ext. only"] == ""
    con = duckdb.connect()
    for v in emails:
        lit = "'" + v.replace("'", "''") + "'"
        assert (
            con.execute(f"select {sql_canonical_email(lit)}").fetchone()[0]
            == got_e[v]
        ), v
    for v in phones:
        lit = "'" + v.replace("'", "''") + "'"
        assert (
            con.execute(f"select {sql_canonical_phone(lit)}").fetchone()[0]
            == got_p[v]
        ), v


def test_encoder_fuzz_parity_seeded(spark):
    """Seeded adversarial fuzz: 400 random strings over a hostile
    alphabet (letters, accents, digits, punctuation, apostrophes,
    repeats) through NYSIIS, accent folding, and email
    canonicalization — Spark and DuckDB must agree on every one.
    Makes the review-time fuzz permanent."""
    import random

    import duckdb
    import pyspark.sql.functions as F

    from record_linkage_ldu_spark.functions.normalizers import (
        canonical_email,
        fold_accents,
        nysiis,
        sql_canonical_email,
        sql_fold_accents,
        sql_nysiis,
    )

    rng = random.Random(42)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "àéîõüßæœłđçñ .-'@+_0123456789"
        "HHWWKNSCHPHEVAY"
    )
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        for _ in range(400)
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: (r["ny"], r["fa"], r["ce"])
        for r in sdf.select(
            "s",
            nysiis(F.col("s")).alias("ny"),
            fold_accents(F.col("s")).alias("fa"),
            canonical_email(F.col("s")).alias("ce"),
        ).collect()
    }
    con = duckdb.connect()
    for v in set(vals):
        lit = "'" + v.replace("'", "''") + "'"
        row = con.execute(
            f"select {sql_nysiis(lit)}, {sql_fold_accents(lit)}, "
            f"{sql_canonical_email(lit)}"
        ).fetchone()
        assert tuple(row) == got[v], (v, got[v], row)
